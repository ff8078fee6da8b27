package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import org.json4s._
import org.json4s.jackson.JsonMethods

/** SQL-defined incremental views — the statement surface over
  * [[Incremental.refreshAgg]] / [[Incremental.refreshJoin]]
  * (DLT's materialized-view shape; the reference's whole user surface
  * is SQL, so its incremental upgrade must be SQL-definable too):
  *
  *   CREATE INCREMENTAL VIEW `target` AS
  *     SELECT g1, ..., sum(e) AS m [, min(e) AS lo, max(e) AS hi, ...]
  *     FROM <source> GROUP BY g1, ...
  *
  *   CREATE INCREMENTAL VIEW `target` PRIMARY KEY (k1, ...) AS
  *     SELECT * FROM <left> l [INNER|LEFT] JOIN <right> r
  *     ON l.a = r.b [AND l.c = r.d ...]
  *
  *   REFRESH INCREMENTAL VIEW <target>
  *
  * CREATE resolves the sources, persists the view DEFINITION as
  * `_incr_view.json` under the target table directory, and runs the
  * initial build (one pinned full scan). REFRESH re-reads the stored
  * definition and brings the target to the sources' latest versions
  * for the cost of the change — the definition lives with the table,
  * so any session (today's or next week's) can refresh it. Exactly-once
  * and no-op-on-no-change semantics are [[Incremental]]'s: watermarks
  * ride the target's commits.
  */
object IncrementalView {

  sealed trait Def
  final case class AggDef(source: String, groupBy: Seq[String],
                          sums: Seq[(String, String)],
                          mins: Seq[(String, String)],
                          maxs: Seq[(String, String)]) extends Def
  final case class JoinDef(left: String, right: String, leftPk: Seq[String],
                           joinKeys: Seq[(String, String)],
                           joinType: String) extends Def

  private def defPath(target: String) = new Path(target, "_incr_view.json")

  /** Persist the definition and run the initial build. Refuses a target
    * that already is an incremental view or a committed lake table.
    */
  def create(spark: SparkSession, target: String, d: Def): Long = {
    val f = LakeTable.fs(spark, target)
    require(!f.exists(defPath(target)),
      s"$target is already an incremental view — REFRESH it, or pick a fresh path")
    require(LakeTable.latestSnapshot(spark, target).isEmpty,
      s"refusing to define an incremental view over $target: it already has " +
        "committed versions")
    val v = refreshDef(spark, target, d)
    // written AFTER the successful initial build: a failed build leaves
    // no half-registered view behind (re-running CREATE is then valid)
    val out = f.create(defPath(target), false)
    try out.write(toJson(d).getBytes("UTF-8")) finally out.close()
    v
  }

  /** Bring an existing view to its sources' latest versions. */
  def refresh(spark: SparkSession, target: String): Long =
    refreshDef(spark, target, readDef(spark, target))

  /** The stored definition, for introspection and REFRESH. */
  def readDef(spark: SparkSession, target: String): Def = {
    val f = LakeTable.fs(spark, target)
    require(f.exists(defPath(target)),
      s"$target is not an incremental view (no _incr_view.json) — CREATE it first")
    val in = f.open(defPath(target))
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
    fromJson(raw)
  }

  private def refreshDef(spark: SparkSession, target: String, d: Def): Long = d match {
    case AggDef(source, groupBy, sums, mins, maxs) =>
      Incremental.refreshAgg(spark, source, target, groupBy,
        measures = sums.map { case (n, e) => n -> expr(e) }.toMap,
        mins = mins.map { case (n, e) => n -> expr(e) }.toMap,
        maxs = maxs.map { case (n, e) => n -> expr(e) }.toMap)
    case JoinDef(left, right, leftPk, joinKeys, joinType) =>
      Incremental.refreshJoin(spark, left, right, target, leftPk, joinKeys, joinType)
  }

  private def pairs(xs: Seq[(String, String)]): JArray =
    JArray(xs.map { case (a, b) => JArray(List(JString(a), JString(b))) }.toList)

  private def toJson(d: Def): String = d match {
    case AggDef(source, groupBy, sums, mins, maxs) =>
      JsonMethods.compact(JsonMethods.render(JObject(
        "kind" -> JString("agg"),
        "source" -> JString(source),
        "groupBy" -> JArray(groupBy.map(JString(_)).toList),
        "sums" -> pairs(sums), "mins" -> pairs(mins), "maxs" -> pairs(maxs))))
    case JoinDef(left, right, leftPk, joinKeys, joinType) =>
      JsonMethods.compact(JsonMethods.render(JObject(
        "kind" -> JString("join"),
        "left" -> JString(left), "right" -> JString(right),
        "leftPk" -> JArray(leftPk.map(JString(_)).toList),
        "joinKeys" -> pairs(joinKeys),
        "joinType" -> JString(joinType))))
  }

  private def fromJson(raw: String): Def = {
    val j = JsonMethods.parse(raw)
    def strs(field: String): Seq[String] =
      (j \ field).asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
    def prs(field: String): Seq[(String, String)] =
      (j \ field).asInstanceOf[JArray].arr.map {
        case JArray(List(JString(a), JString(b))) => (a, b)
        case other => throw new IllegalStateException(s"bad pair in $field: $other")
      }
    (j \ "kind") match {
      case JString("agg") =>
        AggDef((j \ "source").asInstanceOf[JString].s, strs("groupBy"),
          prs("sums"), prs("mins"), prs("maxs"))
      case JString("join") =>
        JoinDef((j \ "left").asInstanceOf[JString].s,
          (j \ "right").asInstanceOf[JString].s, strs("leftPk"),
          prs("joinKeys"), (j \ "joinType").asInstanceOf[JString].s)
      case other => throw new IllegalStateException(
        s"unknown incremental-view kind: $other")
    }
  }
}
