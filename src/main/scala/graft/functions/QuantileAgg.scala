package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable quantile sketches over Spark's own Greenwald-Khanna
  * summary (`QuantileSummaries` — the engine behind
  * `approxQuantile`/`approx_percentile`'s relative-error variant),
  * surfaced as lake-persistable binaries: `gk_sketch_agg(x, eps)`
  * builds a partial, `gk_union_agg(bytes)` merges partials (GK merge
  * adds rank-error budgets, still ≤ the per-sketch eps for same-eps
  * inputs by the summary's own merge bound), `gk_quantile(bytes, q)`
  * queries. This is the third leg of the incremental-sketch trio
  * (HLL distinct, CMS heavy hitters, GK quantiles): per-batch
  * percentile tracking at cost-of-the-batch where exact `percentile`
  * re-sorts the world.
  *
  * The wire format is hand-rolled ([eps][threshold][count][n][(value,
  * g, delta)…], big-endian) rather than Java serialization: a
  * lake-persisted binary must survive engine upgrades, and the GK
  * tuple set is the summary's complete state.
  */
object QuantileAgg {

  private[graft] def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = if (qs0.compressed) qs0 else qs0.compress()
    val s = qs.sampled
    val buf = ByteBuffer.allocate(8 + 4 + 8 + 4 + s.length * 24)
    buf.putDouble(qs.relativeError)
    buf.putInt(qs.compressThreshold)
    buf.putLong(qs.count)
    buf.putInt(s.length)
    s.foreach { st => buf.putDouble(st.value); buf.putLong(st.g); buf.putLong(st.delta) }
    buf.array()
  }

  private[graft] def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val buf = ByteBuffer.wrap(bytes)
    val eps = buf.getDouble
    val threshold = buf.getInt
    val count = buf.getLong
    val n = buf.getInt
    val sampled = Array.tabulate(n) { _ =>
      new QuantileSummaries.Stats(buf.getDouble, buf.getLong, buf.getLong)
    }
    new QuantileSummaries(threshold, eps, sampled, count, true)
  }

  /** `gk_sketch_agg(x, eps)` → binary GK summary of the non-null
    * doubles. Null on zero inputs.
    */
  final case class GkSketchAgg(child: Expression, eps: Double,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries]
      with UnaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gk_sketch_agg needs DOUBLE input, got ${child.dataType}")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "gk_sketch_agg"

    override def createAggregationBuffer(): QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

    override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buf else buf.insert(v.asInstanceOf[Double])
    }
    override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries = {
      val c1 = if (b1.compressed) b1 else b1.compress()
      val c2 = if (b2.compressed) b2 else b2.compress()
      if (c2.count == 0) c1 else if (c1.count == 0) c2 else c1.merge(c2)
    }
    override def eval(buf: QuantileSummaries): Any =
      if (buf.count == 0) null else toBytes(buf)

    override def serialize(buf: QuantileSummaries): Array[Byte] = toBytes(buf)
    override def deserialize(bytes: Array[Byte]): QuantileSummaries = fromBytes(bytes)
    override def withNewMutableAggBufferOffset(o: Int): GkSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): GkSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): GkSketchAgg =
      copy(child = newChild)
  }

  /** `gk_union_agg(bytes)` — merge serialized summaries. */
  final case class GkUnionAgg(child: Expression,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries]
      with UnaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gk_union_agg needs BINARY input, got ${child.dataType}")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "gk_union_agg"

    override def createAggregationBuffer(): QuantileSummaries = null
    override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val bytes = child.eval(input).asInstanceOf[Array[Byte]]
      if (bytes == null || bytes.isEmpty) buf
      else {
        val s = fromBytes(bytes)
        if (buf == null || buf.count == 0) s
        else if (s.count == 0) buf
        else buf.merge(s)
      }
    }
    override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
      if (b1 == null) b2 else if (b2 == null) b1
      else if (b2.count == 0) b1 else if (b1.count == 0) b2
      else b1.merge(b2)
    override def eval(buf: QuantileSummaries): Any =
      if (buf == null) null else toBytes(buf)
    override def serialize(buf: QuantileSummaries): Array[Byte] =
      if (buf == null) Array.emptyByteArray else toBytes(buf)
    override def deserialize(bytes: Array[Byte]): QuantileSummaries =
      if (bytes.isEmpty) null else fromBytes(bytes)
    override def withNewMutableAggBufferOffset(o: Int): GkUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): GkUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): GkUnionAgg =
      copy(child = newChild)
  }

  /** `gk_quantile(bytes, q)` — the summary's quantile estimate (rank
    * error ≤ eps·count). Cached by reference like
    * [[CmsAgg.CmsEstimate]].
    */
  final case class GkQuantile(left: Expression, right: Expression)
      extends Expression with CodegenFallback with BinaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gk_quantile needs (BINARY, DOUBLE), got (${left.dataType}, ${right.dataType})")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "gk_quantile"

    @transient private var cachedBytes: Array[Byte] = _
    @transient private var cachedQs: QuantileSummaries = _

    override def eval(input: InternalRow): Any = {
      val bytes = left.eval(input).asInstanceOf[Array[Byte]]
      val q = right.eval(input)
      if (bytes == null || q == null) null
      else {
        if (!(bytes eq cachedBytes)) {
          cachedQs = fromBytes(bytes); cachedBytes = bytes
        }
        cachedQs.query(q.asInstanceOf[Double]).getOrElse(null)
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): GkQuantile =
      copy(left = l, right = r)
  }

  /** Idempotent registration, [[Sketches.register]] discipline. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val names = Seq("gk_sketch_agg", "gk_union_agg", "gk_quantile")
    if (names.forall(n =>
        reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))))
      return
    reg.createOrReplaceTempFunction("gk_sketch_agg",
      es => GkSketchAgg(es.head, es(1) match {
        case Literal(v, DoubleType) => v.asInstanceOf[Double]
        case other => other.eval().asInstanceOf[Double]
      }), "scala_udf")
    reg.createOrReplaceTempFunction("gk_union_agg", es => GkUnionAgg(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("gk_quantile", es => GkQuantile(es.head, es(1)), "scala_udf")
  }
}
