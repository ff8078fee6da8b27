package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketching operators.
  *
  * Builtin higher-order functions re-evaluate their argument arrays per
  * outer-lambda iteration after projection collapse, which makes
  * 64-permutation sketches O(64·hash) per element. These expressions do
  * the whole sketch in one JVM pass over a pre-hashed token array.
  * CodegenFallback is fine here: the per-row work dominates and the
  * expressions sit right before a shuffle, not inside a hot codegen'd
  * pipeline.
  */
object Sketches {

  /** 64-bit SimHash from an array<long> of per-token hashes. */
  case class SimHashBits(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
        i += 1
      }
      var sim = 0L
      var b = 0
      while (b < 64) { if (counts(b) * 2 > n) sim |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sim)
    }
    override protected def withNewChildInternal(newChild: Expression): SimHashBits = copy(newChild)
  }

  /** MinHash signature (`numPerms` values) from an array<long> of
    * per-shingle hashes: permutation i is the affine mix
    * a_i * h + b_i over the 64-bit ring (a_i odd), constants derived
    * from splitmix64 — one base hash per shingle instead of one seeded
    * hash per (shingle, permutation).
    */
  case class MinHashSig(child: Expression, numPerms: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    private lazy val (as, bs): (Array[Long], Array[Long]) = {
      def splitmix(seed: Long): Long = {
        var z = seed + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val a = Array.tabulate(numPerms)(i => splitmix(i.toLong * 2) | 1L)
      val b = Array.tabulate(numPerms)(i => splitmix(i.toLong * 2 + 1))
      (a, b)
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numPerms)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var p = 0
        while (p < numPerms) {
          val v = as(p) * h + bs(p)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(newChild)
  }

  /** Register the sketch functions for use via expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash_bits", es => SimHashBits(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, es(1).eval().asInstanceOf[Int]), "scala_udf")
  }
}
