package graft

import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** fsck: stat-only log-vs-filesystem audit — healthy tables report
  * nothing, every class of damage is itemized.
  */
class FsckSpec extends SparkSpec {

  test("a healthy table audits clean; damage is itemized per component") {
    val t = s"${java.nio.file.Files.createTempDirectory("fsck")}/t"
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    LakeTable.overwrite(spark, t, df.repartition(4, col("k")))
    LakeTable.enableBloomFilter(spark, t, "k", fpp = 0.01)
    LakeTable.overwrite(spark, t, df.repartition(4, col("k")))
    LakeTable.deleteMergeOnRead(spark, t, col("k") === 3)
    assert(LakeTable.fsck(spark, t).isEmpty, "healthy table: no findings")

    val snap = LakeTable.latestSnapshot(spark, t).get
    val dvEntry = snap.files.find(_.dv.isDefined).get
    val plain = snap.files.filter(e => e.dv.isEmpty).map(_.path)
    assert(plain.size >= 2, "need two undamaged-by-dv files to damage")

    // four kinds of damage behind the log's back
    assert(new java.io.File(s"$t/data/${plain.head}").delete())
    val grow = new java.io.FileOutputStream(s"$t/data/${plain(1)}", true)
    try grow.write(1) finally grow.close()
    def rmTree(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rmTree)); p.delete(); ()
    }
    rmTree(new java.io.File(s"$t/${dvEntry.dv.get.path}"))
    assert(new java.io.File(s"$t/${dvEntry.bloom.get}").delete())

    val issues = LakeTable.fsck(spark, t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(issues.exists(i => i._1 == plain.head && i._2 == "data" &&
      i._3 == "missing"), s"missing data file reported, got ${issues.mkString("; ")}")
    assert(issues.exists(i => i._1 == plain(1) && i._2 == "data" &&
      i._3.contains("size mismatch")), "size drift reported")
    assert(issues.exists(i => i._2 == "delete_vector" &&
      i._3.contains("resurrect")), "missing vector reported as resurrection risk")
    assert(issues.exists(i => i._2 == "bloom" && i._3.contains("advisory")),
      "missing bloom reported as advisory")
    // the bloom sidecar is SHARED by all four entries of the commit —
    // one finding, not one per referencing entry
    assert(issues.length == 4,
      s"exactly four findings (shared sidecars dedup), got ${issues.mkString("; ")}")

    val viaSql = spark.sql(s"FSCK TABLE '$t'").collect()
    assert(viaSql.length == 4, "FSCK TABLE surfaces the same findings via SQL")
    assert(viaSql.map(_.getString(1)).toSet ==
      Set("data", "delete_vector", "bloom"))
  }
}
