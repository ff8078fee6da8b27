package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Measured recall gates for the approximate tier. These operators
  * pass the driver's correctness gate as rows-only (no SQL oracle can
  * replay a probabilistic sketch), so THIS spec is what stops their
  * quality drifting silently: each one's recall is computed against
  * its exact counterpart on the same data and asserted against a
  * floor, and the values are printed on one `RECALL` line for the
  * round log.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val recalls = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  test("ann_ivf recall@5 vs exact brute-force top-k") {
    val exact = Similarity.annTopk(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    recalls("ann_ivf@5") = recall
    // the r14 bound-probing phase 2 makes IVF exact, not approximate
    assert(ivf == exact, s"ann_ivf diverges: recall $recall")
  }

  test("ann_quant equals exact brute-force top-k row for row") {
    // the error-bounded candidate rule guarantees a superset of the
    // true top-k before the exact re-rank, so this is an EQUALITY
    // gate, not a recall floor (and the DuckDB oracle re-checks it)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = rows(Similarity.annTopk(spark, sf))
    val quant = rows(Similarity.annQuant(spark, sf))
    recalls("ann_quant@5") =
      quant.intersect(exact).size.toDouble / exact.size
    assert(exact.nonEmpty)
    assert(quant == exact,
      s"missing=${exact.diff(quant).take(5)} extra=${quant.diff(exact).take(5)}")
  }

  test("ann_pq equals exact brute-force top-k row for row") {
    // the Cauchy–Schwarz residual bound guarantees a candidate
    // superset of the true top-k before the exact re-rank, so PQ is
    // an EQUALITY gate like ann_quant — at the default geometry AND
    // at a deliberately starved codebook (loose bounds, wide
    // candidate sets, same exact answer)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = rows(Similarity.annTopk(spark, sf))
    val pq = rows(Similarity.annPq(spark, sf))
    recalls("ann_pq@5") = pq.intersect(exact).size.toDouble / exact.size
    assert(exact.nonEmpty)
    assert(pq == exact,
      s"missing=${exact.diff(pq).take(5)} extra=${pq.diff(exact).take(5)}")
    val starved = rows(Similarity.annPq(spark, sf, subspaces = 4, codebookSize = 2))
    assert(starved == exact,
      s"starved-codebook PQ diverged: missing=${exact.diff(starved).take(5)}")
  }

  test("ann_lsh recall vs exact cosine pairs at the same threshold") {
    val t = 0.35
    // exact ground truth: every unordered pair at cosine >= t, brute
    // force over the small-SF corpus
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val withNorm = e.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, 0d, (acc, x) -> acc + x * x)")))
    val a = withNorm.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = withNorm.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    val exact = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0d, (acc, x) -> acc + x)")
          / (col("na") * col("nb")))
      .filter(col("cosine") >= t)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLsh(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    recalls("ann_lsh") = recall
    assert(exact.nonEmpty)
    assert(recall >= 0.9, s"ann_lsh recall $recall < 0.9")
  }

  test("ann_lsh_idx recall@5 vs exact brute-force top-k") {
    val exact = Similarity.annTopk(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val idx = Similarity.annLshIncr(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = idx.intersect(exact).size.toDouble / exact.size
    recalls("ann_lsh_idx@5") = recall
    assert(recall >= 0.9, s"ann_lsh_idx recall@5 $recall < 0.9")
  }

  test("ann_ivfpq equals exact brute-force top-k row for row") {
    // the composed architecture: angular cell pruning picks WHICH rows
    // scan, the PQ bound picks WHICH rows re-rank — equality must hold
    // at the default geometry AND with phase 2 forced to do real work
    // (probes=2) on a starved codebook
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = rows(Similarity.annTopk(spark, sf))
    val got = rows(Similarity.annIvfPq(spark, sf))
    recalls("ann_ivfpq@5") = got.intersect(exact).size.toDouble / exact.size
    assert(exact.nonEmpty)
    assert(got == exact,
      s"missing=${exact.diff(got).take(5)} extra=${got.diff(exact).take(5)}")
    val stressed = rows(Similarity.annIvfPq(spark, sf,
      probes = 2, subspaces = 4, codebookSize = 2))
    assert(stressed == exact,
      s"stressed IVF-PQ diverged: missing=${exact.diff(stressed).take(5)}")
  }

  test("ann_pq_idx: persisted index + O(delta) append equal brute force") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = rows(Similarity.annTopk(spark, sf))
    // the gate flow: build on the even half, append the odd half
    val got = rows(Similarity.annPqIncr(spark, sf))
    recalls("ann_pq_idx@5") = got.intersect(exact).size.toDouble / exact.size
    assert(got == exact,
      s"missing=${exact.diff(got).take(5)} extra=${got.diff(exact).take(5)}")
    // both re-rank routes agree: candidate ids PUSHED into the
    // embeddings scan (default) and the unpushed fallback (cap 0)
    val idx = java.nio.file.Files.createTempDirectory("pq_idx").toString + "/pq"
    Similarity.buildPqIndex(spark, sf, idx, only = Some(col("vec_id") % 2 === 0))
    Similarity.pqAppend(spark, idx,
      graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1))
    assert(rows(Similarity.annPqIndexed(spark, sf, idx)) == exact)
    assert(rows(Similarity.annPqIndexed(spark, sf, idx, maxPushedKeys = 0)) == exact)
  }

  test("ann_ivfpq_idx: persisted index + radius-merging append equal brute force") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = rows(Similarity.annTopk(spark, sf))
    val got = rows(Similarity.annIvfPqIncr(spark, sf))
    recalls("ann_ivfpq_idx@5") = got.intersect(exact).size.toDouble / exact.size
    assert(got == exact,
      s"missing=${exact.diff(got).take(5)} extra=${got.diff(exact).take(5)}")
  }

  test("ivfPqAppend crash window is harmless: radii commit first, rows second") {
    // ivfPqAppend makes two commits (centroids radii, then corpus). A
    // probe between them — or after a crash in that window — must stay
    // exact: widened radii without the rows only LOOSEN phase-2
    // pruning. (The reverse order would let a stale radius prune a
    // cell holding a true new neighbor: silent non-exactness.)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_crash").toString + "/ivfpq"
    Similarity.buildIvfPqIndex(spark, sf, idx, only = Some(col("vec_id") % 2 === 0))
    val before = rows(Similarity.annIvfPqIndexed(spark, sf, idx))
    val vPre = graft.lake.LakeTable.latestSnapshot(spark, s"$idx/corpus").get.version
    Similarity.ivfPqAppend(spark, idx,
      graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1))
    // reconstruct the mid-append state: radii already MAX-merged, the
    // corpus rows not yet visible
    graft.lake.LakeTable.restore(spark, s"$idx/corpus", vPre)
    val crashed = rows(Similarity.annIvfPqIndexed(spark, sf, idx))
    assert(crashed == before,
      s"widened radii without rows changed results: missing=" +
        s"${before.diff(crashed).take(5)} extra=${crashed.diff(before).take(5)}")
    // now the REAL crash: the injected failpoint dies between the two
    // commits (not a state reconstruction) — the probe must stay exact,
    // and RE-RUNNING the append must converge (radius MAX-merge is
    // idempotent; the corpus rows land exactly once)
    val idx2 = java.nio.file.Files.createTempDirectory("ivfpq_crash2").toString + "/ivfpq"
    Similarity.buildIvfPqIndex(spark, sf, idx2, only = Some(col("vec_id") % 2 === 0))
    val before2 = rows(Similarity.annIvfPqIndexed(spark, sf, idx2))
    val delta = graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1)
    Similarity.failAfterRadiusCommit = true
    val e = intercept[IllegalStateException](Similarity.ivfPqAppend(spark, idx2, delta))
    assert(e.getMessage.contains("injected crash"))
    assert(!Similarity.failAfterRadiusCommit) // self-cleared
    // mid-window probe: widened radii, no rows — still exact
    assert(rows(Similarity.annIvfPqIndexed(spark, sf, idx2)) == before2)
    // recovery: replay the append, then the probe sees the full corpus
    // and equals the from-scratch index built over everything
    Similarity.ivfPqAppend(spark, idx2, delta)
    val recovered = rows(Similarity.annIvfPqIndexed(spark, sf, idx2))
    val full = rows(Similarity.annIvfPqIncr(spark, sf))
    assert(recovered == full,
      s"replayed append diverged: missing=${full.diff(recovered).take(5)} " +
        s"extra=${recovered.diff(full).take(5)}")
  }

  test("dedup_minhash recall vs the exact Jaccard pair set") {
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.dedupMinhash(spark, sf, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val recall = mh.intersect(exact).size.toDouble / exact.size
    recalls("dedup_minhash") = recall
    assert(exact.nonEmpty)
    assert(recall >= 0.9, s"dedup_minhash recall $recall < 0.9")
  }

  test("dedup_simhash chunk blocking is lossless within the hamming bound") {
    graft.functions.Sketches.register(spark)
    // brute-force ground truth over the collected 64-bit signatures
    val sigs = graft.Tables.documents(spark, sf)
      .withColumn("toks", graft.functions.TextFns.tokens(col("text")))
      .withColumn("simhash", expr(
        "simhash_bits(transform(toks, t -> cast(conv(substr(md5(t), 1, 16), 16, -10) as bigint)))"))
      .select("doc_id", "simhash").as[(Long, Long)].collect()
    val exact = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 3
    } yield {
      val (x, y) = (sigs(i)._1, sigs(j)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    val got = Dedup.dedupSimhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    recalls("dedup_simhash") = if (exact.isEmpty) 1.0
      else got.intersect(exact).size.toDouble / exact.size
    assert(got == exact, "4x16-bit chunk blocking must be exhaustive at hamming <= 3")
    // pigeonhole argument: <=3 differing bits cannot touch all 4 chunks
    assert(recalls("dedup_simhash") == 1.0)
  }

  test("recall summary line for the round log") {
    assert(recalls.size == 10, s"expected all ten recalls measured, got $recalls")
    val json = recalls.map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    info(s"RECALL $json")
    println(s"RECALL $json")
  }
}
