package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic put-if-absent primitive the whole commit protocol rests
  * on: publish a fully-written `tmp` file as `target` iff `target` does
  * not already exist, returning whether this writer won. Implementations
  * MUST be atomic — two concurrent calls for the same target must admit
  * exactly one winner, with no window in which both succeed or the
  * target is observable half-written. Everything else in the log
  * (optimistic retry, snapshot isolation, exactly-once streaming
  * watermarks) is built on this one guarantee.
  *
  * Implementations are registered PER SCHEME ([[LakeTable.registerCommitPublisher]]).
  * Only schemes with a known-atomic primitive ship built in:
  *
  *  - `file` — publish via a hard link: link(2) fails with EEXIST
  *    atomically in the kernel.
  *  - `hdfs`, `viewfs` — `FileContext.rename` with `Options.Rename.NONE`,
  *    which contractually fails with FileAlreadyExistsException when the
  *    destination exists; on HDFS the check-and-rename is one NameNode op.
  *  - `abfs`/`abfss` — ADLS Gen2 is a hierarchical namespace with true
  *    atomic rename; same FileContext contract.
  *
  * S3-family schemes (`s3`, `s3a`, `s3n`) are deliberately ABSENT: S3
  * has no atomic rename or link, and a plain copy-then-check degrades
  * the commit protocol to last-writer-wins — silent snapshot loss under
  * concurrency. The reference lakehouse runs exactly there (ref:
  * s3_data_landing_component.py:28-30) and solves it the way Iceberg
  * does, with an external atomic swap (the Glue catalog;
  * trino_iceberg_transform_component.py:117-120) — Delta uses a
  * LogStore with a conditional PUT. An S3 deployment of this library
  * must register a publisher backed by such a primitive (S3
  * conditional-PUT `If-None-Match`, a DynamoDB lock table, …);
  * unregistered schemes are refused loudly at commit time rather than
  * silently corrupted under a race.
  */
trait CommitPublisher {
  /** True iff `tmp` became `target`; false iff `target` already existed.
    * `tmp` may be left behind either way — the caller deletes it.
    */
  def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean
}

/** `file`: a hard link is the kernel's put-if-absent. A plain
  * `FileSystem.rename` cannot serve here — it is POSIX rename(2), which
  * silently REPLACES an existing target, so an exists() pre-check
  * leaves a TOCTOU window in which two racing writers both "win" the
  * same version and one snapshot is lost.
  */
private[lake] object HardLinkPublisher extends CommitPublisher {
  def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean =
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}

/** Stores whose `FileContext.rename(…, Rename.NONE)` is genuinely
  * atomic (HDFS and kin): the no-overwrite check-and-rename is a single
  * namespace operation.
  */
private[lake] object RenameNonePublisher extends CommitPublisher {
  def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
    try { fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.PathExistsException        => false
    }
  }
}
