package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the round-12 corpus-pipeline additions: the composite
  * quality funnel, temperature source mixing, and distributed BPE merge
  * training — each pinned against an independent in-memory reference
  * computation on the small SF.
  */
class CorpusOpsSpec extends SparkSpec {

  private def ws(text: String): Array[String] = text.trim.split("\\s+")

  test("corpus_filter verdicts match an in-memory rule replay exactly") {
    val got = TextAnalysis.corpusFilter(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { d =>
      val (id, text) = (d.getLong(0), d.getString(1))
      val w = ws(text)
      val nTok = w.length.toLong
      val nChars = text.length.toLong
      val alpha = text.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')).toLong
      val digit = text.count(c => c >= '0' && c <= '9').toLong
      val grams = if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
      val nG = grams.size.toLong
      val nD = grams.distinct.size.toLong
      val rShort = nTok < 5
      val rLong = nChars - nTok + 1 > 12 * nTok
      val rAlpha = 5 * alpha < 3 * nChars
      val rDigit = 5 * digit > nChars
      val rDup = 10 * (nG - nD) > 3 * nG
      val row = got(id)
      assert(row.getAs[Boolean]("r_short") == rShort, s"doc $id r_short")
      assert(row.getAs[Boolean]("r_long_word") == rLong, s"doc $id r_long_word")
      assert(row.getAs[Boolean]("r_low_alpha") == rAlpha, s"doc $id r_low_alpha")
      assert(row.getAs[Boolean]("r_digit") == rDigit, s"doc $id r_digit")
      assert(row.getAs[Boolean]("r_dup") == rDup, s"doc $id r_dup")
      val keep = !(rShort || rLong || rAlpha || rDigit || rDup)
      assert(row.getAs[Boolean]("keep") == keep, s"doc $id keep")
      val reason =
        if (rShort) "short" else if (rLong) "long_word" else if (rAlpha) "low_alpha"
        else if (rDigit) "digit" else if (rDup) "dup" else null
      assert(row.getAs[String]("drop_reason") == reason, s"doc $id drop_reason")
    }
  }

  private val tokRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r

  test("source_mix equals the in-memory temperature-weight computation") {
    val rows = TextAnalysis.sourceMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val per = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, ds) =>
        s -> (ds.length.toLong, ds.map(d => tokRe.findAllIn(d.getString(1)).size.toLong).sum)
      }
    assert(per.nonEmpty && rows.size == per.size)
    val sumW = per.values.map(v => BigDecimal(math.sqrt(v._2.toDouble))
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val tot = per.values.map(_._2).sum.toDouble
    per.foreach { case (s, (nDocs, nTok)) =>
      val r = rows(s)
      val p = math.sqrt(nTok.toDouble) / sumW
      assert(r.getAs[Long]("n_docs") == nDocs, s"$s n_docs")
      assert(r.getAs[Long]("n_tokens") == nTok, s"$s n_tokens")
      assert(math.abs(r.getAs[Double]("token_share") - nTok / tot) < 1e-6, s"$s share")
      assert(math.abs(r.getAs[Double]("mix_weight") - p) < 1e-6, s"$s weight")
      assert(r.getAs[Long]("sampled_tokens") == math.floor(p * 1e6).toLong, s"$s sampled")
      assert(math.abs(r.getAs[Double]("epochs") - p * 1e6 / nTok) < 1e-3, s"$s epochs")
    }
    // mixture probabilities form a distribution
    assert(math.abs(rows.values.map(_.getAs[Double]("mix_weight")).sum - 1.0) < 1e-4)
  }

  test("corpus_stats distribution is coherent and totals tie to token_count") {
    val rows = TextAnalysis.corpusStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, p50, p90, p99, mx) = (r.getAs[Long]("min_tokens").toDouble,
        r.getAs[Double]("p50_tokens"), r.getAs[Double]("p90_tokens"),
        r.getAs[Double]("p99_tokens"), r.getAs[Long]("max_tokens").toDouble)
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx,
        s"${r.getAs[String]("source")}: quantiles out of order")
      assert(math.abs(r.getAs[Double]("mean_tokens") -
        r.getAs[Long]("total_tokens").toDouble / r.getAs[Long]("n_docs")) < 1e-3)
    }
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val totalToks = rows.map(_.getAs[Long]("total_tokens")).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    assert(totalToks == TextAnalysis.tokenCount(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("bpe_tokens")).head.getLong(0))
  }

  /** Reference single-node BPE (Sennrich semantics): overlapping
    * adjacent-pair counts weighted by word frequency; argmax with
    * (count desc, left, right) tie-break; greedy left-to-right
    * non-overlapping merge.
    */
  private def refBpe(wordCounts: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    def chars(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    var vocab: Map[Vector[String], Long] =
      wordCounts.groupMapReduce { case (w, _) => chars(w) :+ "</w>" }(_._2)(_ + _)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= k && !done) {
      val pairs = vocab.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), pc) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, l + r, pc))
        vocab = vocab.toSeq.map { case (syms, c) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
          } -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("bpe_encode applies the learned merges: per-doc counts match a reference encode") {
    def chars(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    val words = docs.flatMap(r => ws(r.getString(1).toLowerCase).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val merges = refBpe(words, 8)
    // encode each distinct word by replaying the merges in rank order
    val encoded: Map[String, Int] = words.keys.map { w =>
      var syms = chars(w) :+ "</w>"
      merges.foreach { case (_, l, r, m, _) =>
        syms = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ m else acc :+ x
        }
      }
      w -> syms.length
    }.toMap
    val got = Bpe.bpeEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { d =>
      val (id, text) = (d.getLong(0), d.getString(1))
      val ws0 = ws(text.toLowerCase).filter(_.nonEmpty)
      if (ws0.isEmpty) assert(!got.contains(id))
      else {
        val row = got(id)
        val nRaw = ws0.map(w => chars(w).length + 1L).sum
        val nBpe = ws0.map(w => encoded(w).toLong).sum
        assert(row.getAs[Long]("n_words") == ws0.length.toLong, s"doc $id n_words")
        assert(row.getAs[Long]("n_raw_syms") == nRaw, s"doc $id n_raw_syms")
        assert(row.getAs[Long]("n_bpe_tokens") == nBpe, s"doc $id n_bpe_tokens")
        assert(math.abs(row.getAs[Double]("compression") - nBpe.toDouble / nRaw) < 1e-3,
          s"doc $id compression")
        assert(row.getAs[Long]("n_bpe_tokens") <= nRaw, s"doc $id: merges never grow")
      }
    }
  }

  test("bpe_train reproduces reference BPE merges exactly") {
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => ws(r.getString(0).toLowerCase).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val expected = refBpe(words, 8)
    val got = Bpe.bpeTrain(spark, sf, numMerges = 8).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == expected,
      s"merge tables differ:\n got      ${got.toSeq}\n expected $expected")
    assert(got.nonEmpty && got.length == 8)
  }

  test("perplexity_filter matches an in-memory bigram-LM replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), ws(r.getString(2).toLowerCase).filter(_.nonEmpty)))
    // Train: add-one-smoothed bigram counts over the en slice, BOS context.
    def bigrams(w: Array[String]): Seq[(String, String)] =
      w.indices.map(i => (if (i == 0) "<s>" else w(i - 1), w(i)))
    val train = docs.filter(_._2 == "en").flatMap(d => bigrams(d._3))
    val c12 = train.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = train.map(_._2).distinct.length.toDouble
    def round5(x: Double): Double = math.floor(x * 1e5 + 0.5) / 1e5
    val expect = docs.map { case (id, lang, w) =>
      val terms = bigrams(w).map { b =>
        -math.log((c12.getOrElse(b, 0L) + 1.0) / (c1.getOrElse(b._1, 0L) + v))
      }
      (id, lang, terms.length.toLong, round5(terms.sum / terms.length))
    }.map(t => t._1 -> t).toMap
    val got = TextAnalysis.perplexityFilter(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (id, lang, n, nll) = (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))
      val (_, eLang, eN, eNll) = expect(id)
      assert(lang == eLang && n == eN, s"doc $id shape")
      assert(math.abs(nll - eNll) < 1e-6, s"doc $id avg_nll got $nll want $eNll")
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(nll)) < 1e-3, s"doc $id ppl")
    }
    // Tertiles: per lang, buckets are 1..3, balanced to within one doc,
    // and non-decreasing along the (avg_nll, doc_id) order.
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(r => (r.getAs[Double]("avg_nll"), r.getAs[Long]("doc_id")))
      val buckets = sorted.map(_.getAs[Long]("ppl_bucket"))
      assert(buckets.forall(b => b >= 1 && b <= 3), s"$lang bucket range")
      assert(buckets.sameElements(buckets.sorted), s"$lang buckets monotone in nll")
      val sizes = buckets.groupBy(identity).view.mapValues(_.length).toMap
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang ntile balance: $sizes")
    }
    // (No cross-language perplexity assertion: the synthetic corpus
    // draws every language from ONE shared vocabulary, so an en-trained
    // LM has no systematic preference to test here.)
  }

  test("doc_shuffle: deterministic, contiguous per-shard positions, epoch reshuffles") {
    val a = TextAnalysis.docShuffle(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard")))
    val b = TextAnalysis.docShuffle(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard")))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)), "re-run must be identical")
    val n = Tables.documents(spark, sf).count()
    assert(a.length == n)
    // positions are 1..size within each shard, no gaps or dupes
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length.toLong),
        s"shard $s positions not contiguous")
    }
    // a different epoch keeps shard assignment (hash of doc_id only)
    // but permutes intra-shard order
    val e2 = TextAnalysis.docShuffle(spark, sf, epoch = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard")))
    val shardOf = a.map(t => t._1 -> t._2).toMap
    assert(e2.forall(t => shardOf(t._1) == t._2), "shards must not move across epochs")
    val posA = a.map(t => t._1 -> t._3).toMap
    assert(e2.count(t => posA(t._1) != t._3) > e2.length / 2,
      "epoch salt must permute the order")
  }

  test("decontaminate_fuzzy matches an in-memory per-eval-item Jaccard replay") {
    val got = TextAnalysis.decontaminateFuzzy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val w = ws(t)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalSets = docs.filter(_._1 < 25).map { case (id, t) => id -> shingles(t) }
    val corpus = docs.filter(_._1 >= 25)
    assert(got.size == corpus.size)
    corpus.foreach { case (id, t) =>
      val sh = shingles(t)
      val row = got(id)
      assert(row.getAs[Long]("n_shingles") == sh.size, s"doc $id n_shingles")
      val cands = evalSets.toSeq.map { case (eid, es) =>
        val inter = (sh & es).size
        val jac = if (inter == 0) 0.0
          else inter.toDouble / (sh.size + es.size - inter)
        (eid, inter, jac)
      }.filter(_._2 > 0)
      if (cands.isEmpty) {
        assert(row.isNullAt(row.fieldIndex("best_eval")), s"doc $id best_eval null")
        assert(row.getAs[Long]("n_shared") == 0 &&
          row.getAs[Double]("jaccard") == 0.0 && !row.getAs[Boolean]("contaminated"))
      } else {
        val (eid, inter, jac) = cands.minBy { case (e, _, j) => (-j, e) }
        assert(row.getAs[Long]("best_eval") == eid, s"doc $id argmax eval")
        assert(row.getAs[Long]("n_shared") == inter, s"doc $id n_shared")
        // same half-away-from-zero rounding as Money.rnd (jac >= 0 here)
        val a = jac * 1e4; val f = math.floor(a)
        val expected = (if (a - f >= 0.5) f + 1.0 else f) / 1e4
        assert(row.getAs[Double]("jaccard") == expected, s"doc $id jaccard")
        assert(row.getAs[Boolean]("contaminated") == (jac >= 0.2), s"doc $id verdict")
      }
    }
    // sanity: the synthetic corpus actually exercises the overlap path
    assert(got.values.count(_.getAs[Long]("n_shared") > 0) > 0, "no overlap at all")
  }

  test("zipf_fit matches an in-memory least-squares replay per language") {
    val got = TextAnalysis.zipfFit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
    val byLang = docs.groupBy(_.getString(0))
    assert(got.keySet == byLang.keySet, "one fit row per language")
    byLang.foreach { case (lang, rows) =>
      val tf = rows.flatMap(_.getString(1).trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => (t, o.length.toLong) }
      val top = tf.toSeq.sortBy { case (t, n) => (-n, t) }.take(100).zipWithIndex
        .map { case ((_, n), i) => (math.log10((i + 1).toDouble), math.log10(n.toDouble)) }
      val k = top.size.toDouble
      val (sx, sy) = (top.map(_._1).sum, top.map(_._2).sum)
      val (sxx, sxy) = (top.map(p => p._1 * p._1).sum, top.map(p => p._1 * p._2).sum)
      val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
      val r = got(lang)
      assert(r.getAs[Long]("n_types") == tf.size, s"$lang types")
      assert(r.getAs[Long]("n_tokens") == tf.values.sum, s"$lang tokens")
      assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-3, s"$lang slope")
      assert(r.getAs[Double]("zipf_slope") < 0.0, s"$lang slope must be negative")
    }
  }
}
