package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable Count-Min-sketch plumbing: Spark ships the builder
  * (`count_min_sketch(col, eps, conf, seed)` → binary) but neither a
  * UNION aggregate nor an ESTIMATOR, which is exactly what an
  * incremental heavy-hitters pipeline needs — per-batch sketch
  * partials persisted to the lake, merged at read time, candidates
  * estimated against the merged sketch. Both functions round-trip
  * Spark's own serialized format (`CountMinSketch.readFrom` /
  * `toByteArray`), so the builder stays the stock codegen'd aggregate
  * and only the merge/estimate steps — O(partials) and O(candidates),
  * never O(rows) — run through these.
  */
object CmsAgg {

  /** `cms_union_agg(sketchBinary)` — fold serialized sketches with
    * `mergeInPlace` (element-wise counter addition: associative and
    * commutative, so partial aggregation order cannot change the
    * result). Incompatible shapes (different eps/conf/seed) fail
    * loudly rather than merging garbage. Null on zero inputs.
    */
  final case class CmsUnionAgg(child: Expression,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CountMinSketch]
      with UnaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cms_union_agg needs BINARY input, got ${child.dataType}")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "cms_union_agg"

    override def createAggregationBuffer(): CountMinSketch = null

    override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
      val bytes = child.eval(input).asInstanceOf[Array[Byte]]
      if (bytes == null || bytes.isEmpty) buf
      else {
        val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
        if (buf == null) s else { buf.mergeInPlace(s); buf }
      }
    }

    override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
      if (b1 == null) b2
      else if (b2 == null) b1
      else { b1.mergeInPlace(b2); b1 }

    override def eval(buf: CountMinSketch): Any =
      if (buf == null) null else buf.toByteArray

    override def serialize(buf: CountMinSketch): Array[Byte] =
      if (buf == null) Array.emptyByteArray else buf.toByteArray
    override def deserialize(bytes: Array[Byte]): CountMinSketch =
      if (bytes.isEmpty) null
      else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

    override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
      copy(child = newChild)
  }

  /** `cms_estimate(sketchBinary, term)` — the sketch's count estimate
    * for a STRING term (hash path identical to the builder's:
    * `estimateCount(String)` and the SQL aggregate's add both hash the
    * UTF-8 bytes, verified empirically in CmsSpec). The deserialized
    * sketch is cached by reference: the usual shape is one merged
    * sketch column joined against a bounded candidate list, and
    * re-parsing per candidate row would dominate.
    */
  final case class CmsEstimate(left: Expression, right: Expression)
      extends Expression with CodegenFallback
      with BinaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (BINARY, STRING), got (${left.dataType}, ${right.dataType})")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "cms_estimate"

    @transient private var cachedBytes: Array[Byte] = _
    @transient private var cachedSketch: CountMinSketch = _

    override def eval(input: InternalRow): Any = {
      val bytes = left.eval(input).asInstanceOf[Array[Byte]]
      val term = right.eval(input).asInstanceOf[UTF8String]
      if (bytes == null || term == null) null
      else {
        if (!(bytes eq cachedBytes)) {
          cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
          cachedBytes = bytes
        }
        cachedSketch.estimateCount(term.toString)
      }
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
      copy(left = l, right = r)
  }

  /** Idempotent registration, [[Sketches.register]] discipline. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val names = Seq("cms_union_agg", "cms_estimate")
    if (names.forall(n =>
        reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))))
      return
    reg.createOrReplaceTempFunction("cms_union_agg", es => CmsUnionAgg(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cms_estimate", es => CmsEstimate(es.head, es(1)), "scala_udf")
  }
}
