package graft.operators

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch lake roots for the gate queries. Every dir is registered
  * for recursive deletion at JVM exit, so repeated Bench/Verify runs
  * in one harness process do not accumulate lake copies on disk
  * (deleteOnExit alone cannot remove non-empty directories).
  */
private[operators] object Work {
  private val roots = scala.collection.mutable.ArrayBuffer.empty[Path]
  Runtime.getRuntime.addShutdownHook(new Thread(() => roots.synchronized {
    roots.foreach { p =>
      scala.util.Try {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder())
          .forEach(q => { Files.deleteIfExists(q); () })
        finally walk.close()
      }
    }
  }))

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    roots.synchronized { roots += p }
    p.toString
  }
}
