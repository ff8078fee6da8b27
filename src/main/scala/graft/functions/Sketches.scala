package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketching / vector operators.
  *
  * Builtin higher-order functions evaluate their lambdas interpreted,
  * per element, and re-evaluate collapsed projection arguments per
  * outer-lambda iteration — which makes 64-permutation sketches
  * O(64·hash) per element and pairwise dot products ~50x slower than a
  * JVM loop. Each expression here does its whole kernel in one pass,
  * and generates code that calls the kernel directly so the expression
  * stays inside whole-stage codegen (no interpreted fallback row path).
  */
object Sketches {

  /** 64-bit SimHash from an array<long> of per-token hashes. */
  case class SimHashBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    def compute(arr: ArrayData): Long = {
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
      sim
    }

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashBits].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): SimHashBits = copy(newChild)
  }

  /** MinHash signature (`numPerms` values) from an array<long> of
    * per-shingle hashes: permutation i is the affine mix
    * a_i * h + b_i over the 64-bit ring (a_i odd), constants derived
    * from splitmix64 — one base hash per shingle instead of one seeded
    * hash per (shingle, permutation).
    */
  case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    private lazy val (as, bs): (Array[Long], Array[Long]) = {
      val a = Array.tabulate(numPerms)(i => Splitmix.mix(i.toLong * 2) | 1L)
      val b = Array.tabulate(numPerms)(i => Splitmix.mix(i.toLong * 2 + 1))
      (a, b)
    }

    def compute(arr: ArrayData): ArrayData = {
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

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(newChild)
  }

  /** Dot product of two array<double> columns in one JVM loop.
    * Left-to-right accumulation — identical result to a sequential
    * fold, so oracle parity with DuckDB's list_dot_product holds.
    */
  case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
      java.lang.Double.valueOf(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductD =
      copy(l, r)
  }

  /** Random-hyperplane sign signatures for all LSH tables in one pass:
    * returns array<int> of `tables` signatures, each `bits` sign bits
    * of dot(v, plane) with deterministic ±1 planes from splitmix64 of
    * (seed, plane, component).
    */
  case class LshSigs(child: Expression, tables: Int, bits: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    @transient private var planesCache: Array[Array[Double]] = _
    @transient private var planesDim: Int = -1

    private def planes(dim: Int): Array[Array[Double]] = {
      if (planesCache == null || planesDim != dim) {
        planesCache = Array.tabulate(tables * bits) { p =>
          Array.tabulate(dim) { j =>
            if ((Splitmix.mix(seed ^ (p.toLong << 32) ^ j.toLong) & 1L) == 1L) 1.0 else -1.0
          }
        }
        planesDim = dim
      }
      planesCache
    }

    def compute(v: ArrayData): ArrayData = {
      val dim = v.numElements()
      val pl = planes(dim)
      val sigs = new Array[Int](tables)
      var t = 0
      while (t < tables) {
        var sig = 0
        var b = 0
        while (b < bits) {
          val p = pl(t * bits + b)
          var dot = 0.0
          var j = 0
          while (j < dim) { dot += v.getDouble(j) * p(j); j += 1 }
          if (dot >= 0) sig |= (1 << b)
          b += 1
        }
        sigs(t) = sig
        t += 1
      }
      new GenericArrayData(sigs)
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lsh", this, classOf[LshSigs].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): LshSigs = copy(newChild)
  }

  /** Jaccard similarity of two SORTED string arrays via two-pointer
    * merge: O(|a|+|b|) with no set materialization. Same rational value
    * as |intersect|/|union| — oracle parity holds.
    */
  case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    def compute(a: ArrayData, b: ArrayData): Double = {
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var common = 0
      while (i < na && j < nb) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { common += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      val union = na + nb - common
      if (union == 0) 0.0 else common.toDouble / union
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("jacc", this, classOf[JaccardSorted].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(l, r)
  }

  /** Shannon entropy (bits per character) of a string's code-point
    * distribution — the degenerate-text signal (binary junk, repeated
    * chars score low). One pass to histogram + one pass over SORTED
    * code points to sum, so the fp accumulation order is deterministic
    * regardless of partitioning. A builtin formulation would need
    * explode → two shuffles for a row-local quantity; this is a single
    * projection inside whole-stage codegen.
    */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    def compute(s: org.apache.spark.unsafe.types.UTF8String): Double = {
      val str = s.toString
      val n = str.codePointCount(0, str.length)
      if (n == 0) return 0.0
      val counts = new java.util.TreeMap[Integer, Integer]()
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        val c = counts.get(cp)
        counts.put(cp, if (c == null) 1 else c + 1)
        i += Character.charCount(cp)
      }
      var h = 0.0
      val it = counts.values().iterator()
      val ln2 = Math.log(2.0)
      while (it.hasNext) {
        val p = it.next().toDouble / n
        h -= p * (Math.log(p) / ln2)
      }
      h
    }

    override def nullSafeEval(input: Any): Any =
      java.lang.Double.valueOf(compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("entropy", this, classOf[CharEntropy].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): CharEntropy = copy(newChild)
  }

  private object Splitmix {
    def mix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** Register the sketch functions for use via expr()/SQL. Idempotent. */
  /** Int8 scalar quantization of an array<double> vector against
    * per-dimension [lo, hi] ranges baked in as literals (sample-fitted
    * by the caller, the IVF-quantizer/Z-order-boundary pattern):
    * q[i] = clamp(round((x - lo[i]) / (hi[i] - lo[i]) * 255) - 128).
    * Returns BINARY — 8 bytes/dim → 1, the memory/bandwidth story that
    * makes a 100 TB embedding scan tractable. A degenerate dimension
    * (hi == lo) quantizes to 0.
    */
  case class QuantizeI8(child: Expression, lo: Array[Double], hi: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = BinaryType

    // the kernel is shared by eval and codegen (codegen calls it via
    // the expression reference — one virtual call per ROW, loop inside)
    def kernel(a: ArrayData): Array[Byte] = {
      val n = math.min(a.numElements(), lo.length)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val range = hi(i) - lo(i)
        val q = if (range <= 0) 0
        else {
          val s = math.round((a.getDouble(i) - lo(i)) / range * 255.0) - 128L
          math.max(-128L, math.min(127L, s))
        }
        out(i) = q.toByte
        i += 1
      }
      out
    }

    override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("quantI8", this, classOf[QuantizeI8].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): QuantizeI8 =
      copy(child = c)
  }

  /** Integer dot product of two int8-quantized BINARY vectors — the
    * cheap first-pass score of the quantized ANN scan (exact re-rank
    * follows on the survivors). Pure int multiply-accumulate in a
    * tight loop, fully inside whole-stage codegen.
    */
  case class DotProductI8(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Array[Byte]]
      val b = r.asInstanceOf[Array[Byte]]
      val n = math.min(a.length, b.length)
      var s = 0L
      var i = 0
      while (i < n) { s += a(i).toLong * b(i).toLong; i += 1 }
      java.lang.Long.valueOf(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.length, $b.length);
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (long) $a[$i] * (long) $b[$i];
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductI8 =
      copy(l, r)
  }

  /** DEQUANTIZED dot product of two int8-quantized BINARY vectors
    * against the (per-dimension) affine quantizer `x̂_i = lo_i +
    * step_i·(q_i + 128)` — the guaranteed-ANN first-pass score. Unlike
    * [[DotProductI8]]'s raw integer MAC (whose order differs from the
    * dequantized order when steps vary per dimension), this estimate
    * carries a PROVABLE bound against the true float dot:
    * `|x·y − x̂·ŷ| ≤ Σ step_i(|x̂_i| + |ŷ_i|)/2 + Σ step_i²/4`
    * (see [[DeqErrI8]]), which is what turns the quantized scan into
    * an EXACT top-k operator (superset filter + exact re-rank) rather
    * than a recall-gated one. Memory traffic stays 1 byte/dimension.
    */
  case class DotI8Deq(left: Expression, right: Expression,
                      lo: Array[Double], step: Array[Double]) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    def kernel(l: Array[Byte], r: Array[Byte]): Double = {
      val n = math.min(math.min(l.length, r.length), lo.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (lo(i) + step(i) * (l(i) + 128)) * (lo(i) + step(i) * (r(i) + 128))
        i += 1
      }
      s
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(kernel(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dotI8Deq", this, classOf[DotI8Deq].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI8Deq =
      copy(left = l, right = r)
  }

  /** Per-vector half of the [[DotI8Deq]] error bound: `Σ_i step_i ·
    * |lo_i + step_i·(q_i + 128)| / 2` — computed ONCE per row over the
    * int8 codes (never per pair). Two of these (corpus row + query) plus
    * the constant `Σ step_i²/4` bound the dequantized-dot error: with
    * `|x_i − x̂_i| ≤ step_i/2` (exact full-corpus [lo,hi] ⇒ no clamping),
    * `|x_i y_i − x̂_i ŷ_i| ≤ |x_i||y_i−ŷ_i| + |ŷ_i||x_i−x̂_i|
    *   ≤ (|x̂_i|+step_i/2)(step_i/2) + |ŷ_i|(step_i/2)`.
    */
  case class DeqErrI8(child: Expression,
                      lo: Array[Double], step: Array[Double]) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    def kernel(a: Array[Byte]): Double = {
      val n = math.min(a.length, lo.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += step(i) * math.abs(lo(i) + step(i) * (a(i) + 128)) / 2.0
        i += 1
      }
      s
    }

    override def nullSafeEval(v: Any): Any =
      java.lang.Double.valueOf(kernel(v.asInstanceOf[Array[Byte]]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("deqErrI8", this, classOf[DeqErrI8].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): DeqErrI8 =
      copy(child = c)
  }

  /** Product-quantization encode: split an array<double> vector into
    * `m` equal subspaces and snap each to its nearest codebook
    * centroid (flat layout `cb[((sub*k)+code)*subDim + d]`, sample-
    * fitted by the caller like [[QuantizeI8]]'s ranges). Returns
    * STRUCT<codes: BINARY, resid: DOUBLE> — `codes` is ONE byte per
    * subspace (8 doubles → 1 byte at subDim=8, the deepest compression
    * of the quantized-ANN tier) and `resid` is the exact reconstruction
    * distance `‖x − x̂‖`, the per-ROW half of the pair bound
    * `|q·x − q·x̂| ≤ ‖q‖·‖x−x̂‖` (Cauchy–Schwarz) that makes the PQ
    * first pass a provable superset filter instead of a recall gamble.
    */
  case class PqEncode(child: Expression, cb: Array[Double], m: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("codes", BinaryType, nullable = false),
      StructField("resid", DoubleType, nullable = false)))

    def kernel(a: ArrayData): InternalRow = {
      val dim = a.numElements()
      val subDim = dim / m
      require(subDim * m == dim && cb.length == m * k * subDim,
        s"pq_encode: dim $dim not m=$m subspaces of the ${cb.length}-entry codebook")
      val codes = new Array[Byte](m)
      var r2 = 0.0
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val off = ((s * k) + c) * subDim
          var d2 = 0.0
          var d = 0
          while (d < subDim) {
            val diff = a.getDouble(s * subDim + d) - cb(off + d)
            d2 += diff * diff
            d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        codes(s) = best.toByte
        r2 += bestD
        s += 1
      }
      InternalRow(codes, Math.sqrt(r2))
    }

    override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  /** Index of the nearest centroid (squared L2 over the full
    * dimension, ties to the LOWEST index) among `k` centroids in the
    * flat array `cb` — the IVF coarse-quantizer assignment as one
    * codegen kernel: no ML vector conversion, no centroid cross join,
    * no per-row window (guide §4). Same scan loop as [[PqEncode]] with
    * a single full-dimension subspace, returning the index instead of
    * packing it into a code byte.
    */
  case class NearestCell(child: Expression, cb: Array[Double], k: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType

    def kernel(a: ArrayData): Int = {
      val dim = a.numElements()
      require(cb.length == k * dim,
        s"nearest_cell: ${cb.length}-entry centroid array is not $k cells of dim $dim")
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = c * dim
        var d2 = 0.0
        var d = 0
        while (d < dim) {
          val diff = a.getDouble(d) - cb(off + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      best
    }

    override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearCell", this, classOf[NearestCell].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): NearestCell =
      copy(child = c)
  }

  /** Per-QUERY lookup table for the PQ asymmetric-distance scan:
    * `lut[(sub*k)+code] = q_sub · c_{sub,code}` over the same flat
    * codebook as [[PqEncode]]. Computed once per query row (the query
    * side is small and broadcast), so the per-PAIR score collapses to
    * `m` table lookups ([[PqAdc]]) — no arithmetic on the corpus
    * vectors at all.
    */
  case class PqLut(child: Expression, cb: Array[Double], m: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    def kernel(a: ArrayData): ArrayData = {
      val dim = a.numElements()
      val subDim = dim / m
      require(subDim * m == dim && cb.length == m * k * subDim,
        s"pq_lut: dim $dim not m=$m subspaces of the ${cb.length}-entry codebook")
      val out = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < k) {
          val off = ((s * k) + c) * subDim
          var dot = 0.0
          var d = 0
          while (d < subDim) { dot += a.getDouble(s * subDim + d) * cb(off + d); d += 1 }
          out((s * k) + c) = dot
          c += 1
        }
        s += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): PqLut =
      copy(child = c)
  }

  /** PQ asymmetric-distance score: `q·x̂ = Σ_sub lut[(sub*k)+code_sub]`
    * — `m` lookup-adds per pair (vs 64 fused multiply-adds for the
    * int8 scan), the cheapest first pass of the ANN tier. The codes'
    * subspace count recovers `k` from the lut length, so the
    * expression stays a pure binary op inside whole-stage codegen.
    */
  case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val codes = l.asInstanceOf[Array[Byte]]
      val lut = r.asInstanceOf[ArrayData]
      require(codes.length > 0 && lut.numElements() % codes.length == 0,
        s"pq_adc: ${lut.numElements()}-entry lut is not a whole number of " +
          s"${codes.length}-subspace rows — codes and lut built under different geometry")
      val k = lut.numElements() / codes.length
      var s = 0.0
      var i = 0
      while (i < codes.length) {
        val code = codes(i) & 0xff
        require(code < k, s"pq_adc: code $code >= k=$k in subspace $i — codes " +
          "encoded under a larger codebook than the lut")
        s += lut.getDouble((i * k) + code)
        i += 1
      }
      java.lang.Double.valueOf(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val kk = ctx.freshName("kk")
        val s = ctx.freshName("s")
        s"""
           |if ($a.length == 0 || $b.numElements() % $a.length != 0) {
           |  throw new IllegalArgumentException("pq_adc: " + $b.numElements() +
           |    "-entry lut is not a whole number of " + $a.length +
           |    "-subspace rows - codes and lut built under different geometry");
           |}
           |int $kk = $b.numElements() / $a.length;
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.length; $i++) {
           |  int ${i}c = ((int) $a[$i]) & 0xff;
           |  if (${i}c >= $kk) {
           |    throw new IllegalArgumentException("pq_adc: code " + ${i}c +
           |      " >= k=" + $kk + " in subspace " + $i +
           |      " - codes encoded under a larger codebook than the lut");
           |  }
           |  $s += $b.getDouble(($i * $kk) + ${i}c);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(l, r)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: sessions built via GraftExtensions already carry these,
    // and re-registration spams "replaced a previously registered
    // function" warnings from every call site that defensively registers.
    // ALL six names gate the skip — a hypothetical partial registration
    // must fall through and (re-)register everything
    val names = Seq("simhash_bits", "minhash_sig", "dot_d", "jaccard_sorted",
      "lsh_sigs", "char_entropy", "dot_i8", "quantize_i8",
      "dot_i8_deq", "deq_err_i8", "pq_encode", "pq_lut", "pq_adc",
      "nearest_cell")
    if (names.forall(n =>
        reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))))
      return
    reg.createOrReplaceTempFunction("simhash_bits", es => SimHashBits(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, evalIntArg("minhash_sig", "numHashes", es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("dot_d", es => DotProductD(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sorted",
      es => JaccardSorted(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_sigs",
      es => LshSigs(es.head,
        evalIntArg("lsh_sigs", "tables", es(1)),
        evalIntArg("lsh_sigs", "bits", es(2)),
        evalLongArg("lsh_sigs", "seed", es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("char_entropy",
      es => CharEntropy(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_i8",
      es => DotProductI8(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_i8",
      es => QuantizeI8(es.head, evalDoubles(es(1)), evalDoubles(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("dot_i8_deq",
      es => DotI8Deq(es.head, es(1), evalDoubles(es(2)), evalDoubles(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("deq_err_i8",
      es => DeqErrI8(es.head, evalDoubles(es(1)), evalDoubles(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode",
      es => PqEncode(es.head, evalDoubles(es(1)),
        evalIntArg("pq_encode", "m", es(2)), evalIntArg("pq_encode", "k", es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("pq_lut",
      es => PqLut(es.head, evalDoubles(es(1)),
        evalIntArg("pq_lut", "m", es(2)), evalIntArg("pq_lut", "k", es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("pq_adc",
      es => PqAdc(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_cell",
      es => NearestCell(es.head, evalDoubles(es(1)),
        evalIntArg("nearest_cell", "k", es(2))), "scala_udf")
  }

  /** Evaluate a foldable array<numeric> argument (the sample-fitted
    * [lo]/[hi] literals of quantize_i8) to a JVM double array at
    * resolution time. (Public alias for the extension injector.)
    */
  def evalDoublesArg(e: Expression): Array[Double] = evalDoubles(e)

  /** Evaluate a foldable integral argument (subspace/codebook counts,
    * band/row geometry) to Int at resolution time, with a real error
    * instead of the opaque ClassCastException a BIGINT literal (`8L`)
    * or the NPE a non-foldable/null argument used to raise.
    */
  def evalIntArg(fn: String, arg: String, e: Expression): Int = {
    val v = evalLongArg(fn, arg, e)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$fn: $arg = $v does not fit in an Int")
    v.toInt
  }

  /** [[evalIntArg]] without the Int range clamp (lsh_sigs' seed). */
  def evalLongArg(fn: String, arg: String, e: Expression): Long = {
    require(e.foldable,
      s"$fn: $arg must be a literal (constant-foldable), got ${e.sql}")
    e.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case null => throw new IllegalArgumentException(
        s"$fn: $arg must not be null")
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got ${other.getClass.getSimpleName} ${e.sql}")
    }
  }

  private def evalDoubles(e: Expression): Array[Double] = {
    val a = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      a.get(i, e.dataType.asInstanceOf[ArrayType].elementType) match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case n: java.lang.Number => n.doubleValue()
        case d: Decimal => d.toDouble
      }
    }
  }
}
