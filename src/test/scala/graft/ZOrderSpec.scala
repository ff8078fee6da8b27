package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit-pins the Z-order rank-bucket expression, which was rewritten
  * from an O(n)-per-row `aggregate` scan to a balanced binary-search
  * `when` tree: the tree must compute EXACTLY the semantic definition
  * `count(boundary <= value)` on longs, strings, and nulls — hitting
  * every boundary value, every gap, and both extremes. (The clustering
  * behavior itself is covered by LakeMetaSpec's z-order compact tests.)
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("bucket binary-search tree equals the reference rank count") {
    val bs: Seq[Any] = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val vals = Seq[java.lang.Long](null, 0L, 9L, 10L, 11L, 20L, 35L, 55L, 70L, 71L, 999L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i, Option(v).map(Long.unbox)) }
      .toDF("i", "v")
      .select(col("i"), ZOrder.bucket(col("v"), bs).cast("long").as("b"))
      .orderBy("i")
    val got = df.select("b").as[Long].collect().toSeq
    val want = vals.map {
      case null => 0L
      case v    => bs.count(b => v >= b.asInstanceOf[Long]).toLong
    }
    assert(got == want, s"got $got, want $want")
  }

  test("bucket ranks strings lexicographically, same definition") {
    val sbs: Seq[Any] = Seq("carol", "mike", "tina")
    val svals = Seq("alice", "carol", "dave", "mike", "zed")
    val sdf = svals.zipWithIndex.map(_.swap).toDF("i", "v")
      .select(ZOrder.bucket(col("v"), sbs).cast("long").as("b"), col("i"))
      .orderBy("i")
    assert(sdf.select("b").as[Long].collect().toSeq ==
      svals.map(v => sbs.count(b => v >= b.asInstanceOf[String]).toLong))
  }

  test("empty boundaries (all-null sample) bucket everything to 0") {
    val e = Seq(1L, 2L).toDF("v")
      .select(ZOrder.bucket(col("v"), Nil).cast("long").as("b"))
    assert(e.as[Long].collect().toSeq == Seq(0L, 0L))
  }
}
