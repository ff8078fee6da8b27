package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.rnd
import graft.functions.TextFns

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, language-ID heuristic, quality
  * scoring, content fingerprinting. All single-pass, codegen-friendly
  * column expressions — no shuffles except final aggregations.
  */
object TextAnalysis {

  private val stopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Marker-word sets for the n-gram language heuristic (public
    * stopword lists). Deterministic and portable: the prediction is
    * argmax of distinct-token overlap with each set, ties broken by
    * fixed language order (en, de, es, fr), 'und' when all zero.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("w")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("bpe_tokens"))

  /** Language identification via marker-word overlap. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", array_distinct(TextFns.tokens(lower(col("text")))))
    val scored = markers.foldLeft(docs) { case (df, (code, ws)) =>
      df.withColumn(s"score_$code",
        size(array_intersect(col("toks"), array(ws.map(lit): _*))).cast("long"))
    }
    val best = markers.foldRight(lit("und"): Column) { case ((code, _), acc) =>
      val s = col(s"score_$code")
      val isMax = markers.map { case (c, _) => s >= col(s"score_$c") }.reduce(_ && _)
      when(s > 0 && isMax, lit(code)).otherwise(acc)
    }
    scored.select(
      col("doc_id"), col("lang").as("declared_lang"),
      best.as("predicted_lang"),
      col("score_en"), col("score_de"), col("score_es"), col("score_fr"))
      .withColumn("agree", col("declared_lang") === col("predicted_lang"))
  }

  /** Quality scoring: alpha/punct/stopword ratios + composite score
    * (the length/punct/stopword heuristics used for pretraining-data
    * filtering).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopwordsEn.map(lit): _*)
    Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("n_chars", length(col("text")).cast("double"))
      .withColumn("n_toks", size(col("w")).cast("double"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") / col("n_chars"))
      .withColumn("punct_ratio",
        length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("double") / col("n_chars"))
      .withColumn("stop_ratio",
        size(array_intersect(array_distinct(col("w")), stopArr)).cast("double") /
          greatest(size(array_distinct(col("w"))).cast("double"), lit(1.0)))
      .withColumn("avg_token_len",
        (col("n_chars") - col("n_toks") + 1.0) / col("n_toks"))
      .select(
        col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        col("n_toks").cast("long").as("n_tokens"),
        rnd(col("alpha_ratio"), 4).as("alpha_ratio"),
        rnd(col("punct_ratio"), 4).as("punct_ratio"),
        rnd(col("stop_ratio"), 4).as("stop_ratio"),
        rnd(col("avg_token_len"), 4).as("avg_token_len"),
        rnd(
          lit(0.4) * col("alpha_ratio")
            + lit(0.3) * least(col("n_toks") / 50.0, lit(1.0))
            + lit(0.3) * (lit(1.0) - col("punct_ratio")), 4).as("quality_score"))
  }

  /** Sequence packing: stream each source shard's documents (doc_id
    * order) into a token buffer and cut a training pack every `budget`
    * tokens — the concat-then-chunk packing a pretraining dataloader
    * performs, precomputed as an assignment table. `pack_id` is the
    * pack a document STARTS in (floor of its exclusive running-token
    * offset over the budget); `pack_offset` is its first token's
    * position within that pack. One window shuffle keyed on the shard
    * column; at 100 TB the shards partition the corpus, so there is no
    * global sort and each shard's running sum is independent —
    * parallelism = number of sources, the same contract a sharded
    * dataloader has.
    */
  def seqPack(spark: SparkSession, dir: String, budget: Int = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toLong)).as("pack_id"),
        ((col("cum") - col("n_tokens")) % lit(budget.toLong)).as("pack_offset"))
  }

  /** Deterministic train/val/test split (8/1/1) by content-independent
    * key hash — stable under re-runs and corpus growth, no RNG state.
    * The bucket is derived from md5 bytes so the same rows land in the
    * same split on any engine (portable to the oracle via ascii()).
    */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val bucket = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 10
    Tables.documents(spark, dir).select(
      col("doc_id"),
      bucket.cast("long").as("bucket"),
      when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test").as("split"))
  }

  /** PII scrubbing: redact emails, URLs, and long digit runs (the
    * standard pretraining-corpus hygiene pass). Patterns are chosen to
    * be portable between Java regex and RE2 so the oracle can replay
    * them.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val email  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url    = "https?://[^\\s]+"
    val digits = "[0-9]{6,}"
    def count(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      count(email).as("n_emails"),
      count(url).as("n_urls"),
      count(digits).as("n_digit_runs"),
      length(
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "<EMAIL>"), url, "<URL>"), digits, "<NUM>"))
        .cast("long").as("redacted_len"))
  }

  /** Winnowing-style content fingerprint: min md5 over 5-gram word
    * shingles (k-gram min-hash). Documents shorter than 5 tokens fall
    * back to whole-text md5.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("sh", TextFns.shingleExpr("w", 5))
      .select(
        col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        when(size(col("w")) >= 5,
          array_min(expr("transform(sh, s -> md5(cast(s as binary)))")))
          .otherwise(md5(col("text").cast("binary"))).as("fingerprint"))

  /** Benchmark decontamination: flag corpus documents sharing any
    * 5-gram shingle with a benchmark/eval set (train-test overlap
    * hygiene; here the first `benchmarkMax` doc_ids stand in for the
    * eval set). The benchmark shingle set is bounded — eval sets are
    * small by nature — so it broadcast-joins against the exploded
    * corpus shingles; the corpus never self-joins, and the per-doc
    * rollup is the only shuffle. Scale path at 100 TB: identical plan,
    * benchmark set still broadcastable.
    */
  def decontaminate(spark: SparkSession, dir: String, benchmarkMax: Long = 25): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("sh", when(size(col("w")) >= 5, TextFns.shingleExpr("w", 5))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("sh"))
    val bench = docs.filter(col("doc_id") < benchmarkMax)
      .select(explode(col("sh")).as("s")).distinct()
      .withColumn("hit", lit(1))
    docs.filter(col("doc_id") >= benchmarkMax)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("s"))
      .join(broadcast(bench), Seq("s"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(col("hit")).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared") > 0).as("contaminated"))
  }

  /** Fuzzy benchmark decontamination: per-eval-ITEM 5-gram Jaccard
    * matching (the FLAN / open-eval "fuzzy dedup against each benchmark
    * example" discipline), complementing [[decontaminate]]'s binary
    * any-overlap flag. Each corpus doc reports its best-matching eval
    * item (argmax Jaccard over distinct-shingle sets, ties to the
    * lowest eval id), the shared-shingle count, and a threshold
    * verdict — so near-copies of a benchmark item are caught even when
    * the verbatim-overlap flag would fire on a single boilerplate
    * shingle. Plan shape is decontaminate's: the bounded eval shingle
    * set broadcast-joins the exploded corpus (never a corpus
    * self-join); the per-(doc, eval) rollup then the per-doc argmax
    * are the only shuffles, both keyed small. Jaccard is exact-integer
    * division (both engines compute the identical IEEE double), so the
    * argmax tie-break is bit-portable.
    */
  def decontaminateFuzzy(spark: SparkSession, dir: String, benchmarkMax: Long = 25,
      threshold: Double = 0.2): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("sh", when(size(col("w")) >= 5, TextFns.shingleExpr("w", 5))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("sh"))
    val bench = docs.filter(col("doc_id") < benchmarkMax)
      .select(col("doc_id").as("eval_id"), size(col("sh")).cast("long").as("n_eval"),
        explode(col("sh")).as("s")) // bounded eval set: inner explode is fine here
    val corpus = docs.filter(col("doc_id") >= benchmarkMax)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"), col("sh"))
    // explode_OUTER, deliberately: Spark's codegen'd inner explode
    // inlines the (big) shingle expression into the per-element loop —
    // measured 27x slower at sf0.1 — while the outer variant
    // materializes the array once per row; the inner join below drops
    // the null rows the outer explode adds, so semantics are identical
    val pairs = corpus
      .select(col("doc_id"), col("n_shingles"), explode_outer(col("sh")).as("s"))
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("doc_id"), col("n_shingles"), col("eval_id"), col("n_eval"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac", col("inter").cast("double") /
        (col("n_shingles") + col("n_eval") - col("inter")).cast("double"))
    // argmax via ordered-struct max: (jaccard desc, eval_id asc)
    val best = pairs
      .groupBy(col("doc_id"))
      .agg(max(struct(col("jac"), (-col("eval_id")).as("neg"),
        col("eval_id"), col("inter"))).as("b"))
      .select(col("doc_id"), col("b.eval_id").as("best_eval"),
        col("b.inter").as("n_shared"), col("b.jac").as("jac"))
    corpus.select(col("doc_id"), col("n_shingles"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        col("best_eval"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        rnd(coalesce(col("jac"), lit(0.0)), 4).as("jaccard"),
        (coalesce(col("jac"), lit(0.0)) >= threshold).as("contaminated"))
  }

  /** Within-document repetition: fraction of duplicated 3-gram
    * occurrences (1 - distinct/total) — the standard boilerplate /
    * degenerate-text signal for pretraining-data filtering. Row-local
    * (zero shuffles); documents under 3 tokens report zero grams and
    * ratio 0.
    */
  def repNgrams(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("g", when(size(col("w")) >= 3, TextFns.shingleAllExpr("w", 3))
        .otherwise(array().cast("array<string>")))
      .select(
        col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"),
        when(size(col("g")) > 0,
          rnd(lit(1.0) - size(array_distinct(col("g"))).cast("double") /
            size(col("g")).cast("double"), 4))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  /** Character-entropy quality signal: Shannon entropy (bits/char) of
    * each document's code-point distribution — binary junk and
    * repeated-character degenerate text score low, natural language
    * sits around 4-5 bits. Computed by the codegen'd CharEntropy
    * expression in one projection pass; a builtin formulation would
    * explode to characters and shuffle twice for a row-local quantity.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Sketches.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      rnd(expr("char_entropy(text)"), 4).as("entropy"))
  }

  /** Corpus-level term frequency: top-k lowercase whitespace tokens
    * with a deterministic tie-break — the canonical two-phase
    * (map-side-combined) distributed word count; the ordered limit
    * runs on the aggregated, vocabulary-bounded result.
    */
  def topTerms(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val top = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
    // rank over the already-limited k rows without an unpartitioned
    // Window (and without a self-join, which would recompute the word
    // count): pack the ≤k rows into one sorted array — struct order
    // (-n, term) = (n desc, term asc), terms unique so the order is
    // total — and the explode position IS the row_number
    top
      .agg(sort_array(collect_list(struct((-col("n")).as("nn"), col("term")))).as("__rows"))
      .select(posexplode(col("__rows")).as(Seq("pos", "r")))
      .select(col("r.term").as("term"), (-col("r.nn")).as("n"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** BM25 relevance top-k (Lucene/Robertson variant: idf = ln(1 +
    * (N - df + ½)/(df + ½)), k1 = 1.2, b = 0.75) of every document
    * against a deterministic query set — the `numQueryTerms` most
    * frequent terms of length ≥ 4 (tie-broken lexically), so the op is
    * self-contained and oracle-checkable. The full-text-relevance
    * primitive a retrieval-augmented pipeline needs next to ANN:
    * lexical ranking where `ann_topk` is semantic.
    *
    * Plan: one explode→(doc,term) partial-agg shuffle for tf, one
    * vocabulary-bounded term agg for df/query selection, then scoring
    * is row-local against BROADCAST query terms and a broadcast 1-row
    * global (N, avgdl = exact-integer token sum / N — integer-exact,
    * so the oracle computes the identical double). The rank window
    * partitions by query term (bounded partitions: only docs
    * containing a query term enter).
    */
  def bm25Topk(spark: SparkSession, dir: String, numQueryTerms: Int = 5,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(TextFns.tokens(lower(col("text"))), x => x =!= "").as("w"))
      .withColumn("dl", size(col("w")))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val termStats = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("n"), count(lit(1)).cast("double").as("df"))
    val queryTerms = termStats.filter(length(col("term")) >= 4)
      .orderBy(col("n").desc, col("term")).limit(numQueryTerms)
      .select(col("term"), col("df"))
    val global = docs.agg(count(lit(1)).cast("double").as("nd"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val scored = tf.join(broadcast(queryTerms), Seq("term"))
      .crossJoin(broadcast(global))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("nd"))
      .withColumn("score",
        log(lit(1.0) + (col("nd") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl").cast("double") / col("avgdl"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), rnd(col("score"), 5).as("score"), col("rank"))
  }

  /** Cross-document repeated exact substrings — the exact-substring
    * dedup primitive (a 20-token window appearing in more than one
    * document is boilerplate/template text a training pipeline clips):
    * every k-token window is digested ROW-LOCALLY (md5 of the joined
    * window, computed inside the explode projection), so the single
    * groupBy shuffle carries 16-byte digests + doc ids, never window
    * text — at 100 TB the shuffle is ~corpus-token-count × digest
    * width, not × window width. Output: spans seen in ≥ 2 documents
    * with occurrence/document counts and the earliest containing doc.
    */
  def dupSpans(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      // explode the POSITIONS, digest at top level: a transform() lambda
      // body evaluates interpreted per element, while slice/join/md5 as
      // top-level projections stay inside whole-stage codegen (~1.7×)
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(1, size(w) - ${k - 1})")).as("i"))
      .select(col("doc_id"),
        md5(array_join(slice(col("w"), col("i"), lit(k)), " ").cast("binary")).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  /** Composite quality funnel (Gopher-rules-style corpus filter): five
    * deterministic keep/drop rules evaluated in one row-local pass, with
    * per-rule flags and a first-failing-rule attribution so a pipeline
    * can report WHY each document was dropped (the funnel counts every
    * production corpus-filter job emits). All thresholds compare
    * integer-exact cross-multiplied counts — never floating ratios — so
    * the verdicts are bit-portable to any engine:
    *   short      n_tokens < 5
    *   long_word  avg token len > 12   ⇔ n_chars - n_tokens + 1 > 12·n_tokens
    *   low_alpha  alpha ratio < 0.6    ⇔ 5·alpha_chars < 3·n_chars
    *   digit      digit ratio > 0.2    ⇔ 5·digit_chars > n_chars
    *   dup        dup 3-gram ratio>0.3 ⇔ 10·(n_grams−n_distinct) > 3·n_grams
    * Zero shuffles at any scale.
    */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("alpha_chars",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .withColumn("digit_chars",
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
      .withColumn("g", when(size(col("w")) >= 3, TextFns.shingleAllExpr("w", 3))
        .otherwise(array().cast("array<string>")))
      .withColumn("n_grams", size(col("g")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("g"))).cast("long"))
      .withColumn("r_short", col("n_tokens") < 5)
      .withColumn("r_long_word",
        col("n_chars") - col("n_tokens") + 1 > lit(12L) * col("n_tokens"))
      .withColumn("r_low_alpha", lit(5L) * col("alpha_chars") < lit(3L) * col("n_chars"))
      .withColumn("r_digit", lit(5L) * col("digit_chars") > col("n_chars"))
      .withColumn("r_dup",
        lit(10L) * (col("n_grams") - col("n_distinct")) > lit(3L) * col("n_grams"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_chars"),
        col("r_short"), col("r_long_word"), col("r_low_alpha"),
        col("r_digit"), col("r_dup"),
        (!col("r_short") && !col("r_long_word") && !col("r_low_alpha") &&
          !col("r_digit") && !col("r_dup")).as("keep"),
        when(col("r_short"), "short")
          .when(col("r_long_word"), "long_word")
          .when(col("r_low_alpha"), "low_alpha")
          .when(col("r_digit"), "digit")
          .when(col("r_dup"), "dup").as("drop_reason"))
  }

  /** Temperature-based source mixing: the per-source sampling weights a
    * multi-source pretraining run uses to flatten the corpus
    * distribution (weight ∝ token_share^α with α = 0.5 — the
    * multilingual-sampling temperature idiom). Emits each source's token
    * share, its normalized mixture probability, the token count a
    * 1M-token budget would draw from it, and the implied epoch factor
    * (> 1 ⇒ the source repeats). One partial-agg shuffle over the
    * corpus to the per-source rollup (group count = number of sources,
    * tiny); normalization joins the broadcast 1-row global. sqrt is
    * IEEE-correctly-rounded so the oracle computes identical doubles.
    */
  def sourceMix(spark: SparkSession, dir: String, budget: Long = 1000000L): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    // The normalizers (Σ tokens, Σ sqrt-weights) come from a window
    // over the ALREADY-AGGREGATED per-source rows — group count, not
    // corpus size — so the corpus is scanned exactly once (a separate
    // global .agg() branch would re-derive its own scan: Catalyst does
    // not dedupe uncached subplans, and the regex tokenizer would run
    // twice over 100 TB). The single-partition exchange carries
    // ~#sources rows. Σ sqrt accumulates in DECIMAL(38,18): exact and
    // order-independent (a double sum would vary in its last ulps with
    // partition order — across engines AND across runs), cast to
    // double once at the end.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perSource
      .withColumn("tot", sum(col("n_tokens")).over(w))
      .withColumn("sum_w",
        sum(sqrt(col("n_tokens").cast("double")).cast("decimal(38,18)"))
          .over(w).cast("double"))
      .withColumn("share", col("n_tokens").cast("double") / col("tot").cast("double"))
      // weight ∝ share^0.5; dividing by Σ sqrt(n_tokens) cancels the
      // common 1/sqrt(tot) factor, so p needs no per-row sqrt(share)
      .withColumn("p", sqrt(col("n_tokens").cast("double")) / col("sum_w"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        rnd(col("share"), 6).as("token_share"),
        rnd(col("p"), 6).as("mix_weight"),
        floor(col("p") * lit(budget.toDouble)).cast("long").as("sampled_tokens"),
        rnd(col("p") * lit(budget.toDouble) / col("n_tokens").cast("double"), 4)
          .as("epochs"))
  }

  /** Corpus profile per source — the dataset-card table every corpus
    * release ships: document counts, token totals, and the exact
    * token-length distribution (mean / p50 / p90 / p99 / min / max).
    * One scan, one partial-agg shuffle to the per-source rollup; the
    * percentiles use Spark's exact interpolated `percentile`, which is
    * value-identical to DuckDB's `quantile_cont` (the proven
    * events_stats pattern). At 100 TB the exact percentile's
    * per-group value buffer is the scale limit — the sketch path
    * (approx_percentile) mirrors events_approx and is the documented
    * swap; the group count here is #sources, so exact holds far.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        rnd(sum(col("n_tokens")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("mean_tokens"),
        rnd(expr("percentile(n_tokens, 0.5)"), 4).as("p50_tokens"),
        rnd(expr("percentile(n_tokens, 0.9)"), 4).as("p90_tokens"),
        rnd(expr("percentile(n_tokens, 0.99)"), 4).as("p99_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** CCNet-style perplexity filtering: train an add-one-smoothed word
    * bigram language model on the trusted reference slice (the `en`
    * documents — the stand-in for CCNet's Wikipedia LM), score EVERY
    * document by average negative log-likelihood per bigram, and
    * bucket each language's docs into head/middle/tail perplexity
    * tertiles (the CCNet quality split).
    *
    * Scale posture: the LM is vocabulary-bounded — `c12` has at most
    * |V|² rows regardless of corpus size, so both count tables
    * broadcast, and scoring is one explode + broadcast joins + ONE
    * groupBy(doc_id) shuffle. Training is a partial-agg shuffle on
    * bigram keys (map-side combine collapses to |V|² per partition).
    * Nothing here is O(corpus) on the driver.
    *
    * Cross-engine parity: per-bigram NLL terms are doubles (identical
    * IEEE inputs to `ln` in both engines) accumulated in
    * DECIMAL(38,18) so the per-doc sum is exact and order-free; the
    * average is rounded to 5 decimals BEFORE the tertile window, so
    * bucket boundaries are decided on identical values with a doc_id
    * tie-break.
    *
    * The tertile ntile window sorts each language within one task —
    * fine for the per-doc AGGREGATE (one row per doc), but at 100 TB
    * with billions of docs per language the production variant swaps
    * ntile for percentile cutoffs computed per lang and joined back
    * broadcast (CCNet itself buckets against precomputed cutoffs);
    * ntile is kept here because it is the bit-portable exact split the
    * oracle can replay.
    */
  def perplexityFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      filter(TextFns.tokens(lower(col("text"))), x => x =!= "").as("w"))
    // Bigram rows with a BOS context for the first token: (w1, w2) for
    // i = 1..n where w1 = '<s>' at i = 1. element_at is guarded by the
    // sequence bound so ANSI mode never sees an OOB index.
    val bi = docs
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(w)),
          |  i -> struct(IF(i = 1, '<s>', element_at(w, i - 1)) AS w1,
          |              element_at(w, i) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val train = bi.filter(col("lang") === "en")
    val c12 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = train.agg(count_distinct(col("w2")).cast("double").as("v"))
    val p = (coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)).cast("double") + col("v"))
    val scored = bi
      .join(broadcast(c12), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("lang"),
        (-log(p)).cast("decimal(38,18)").as("nll"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
        rnd(sum(col("nll")).cast("double") / count(lit(1)).cast("double"), 5)
          .as("avg_nll"))
    val tertile = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("avg_nll"), col("doc_id"))
    scored.select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_nll"),
      rnd(exp(col("avg_nll")), 4).as("ppl"),
      ntile(3).over(tertile).cast("long").as("ppl_bucket"))
  }

  /** Deterministic training-order shuffle: every epoch's dataloader
    * must see the corpus in a reproducible pseudo-random order, split
    * across shards. Each doc hashes to a shard (md5 bucket — row-local)
    * and gets its position within the shard by ordering on a second,
    * epoch-salted hash. The window partitions BY SHARD, so ranking
    * parallelizes across shards and no global sort exists at any
    * scale — exactly a sharded dataloader's contract (shards are
    * independent streams; only intra-shard order matters). One
    * hash-partition exchange, shard-local sorts.
    */
  def docShuffle(spark: SparkSession, dir: String, shards: Int = 8,
                 epoch: Int = 1): DataFrame = {
    val shardHash = md5(col("doc_id").cast("string").cast("binary"))
    val shard = (ascii(substring(shardHash, 1, 1)) * 256 +
      ascii(substring(shardHash, 2, 1))) % shards
    val orderHash = md5(concat(lit(s"epoch-$epoch:"),
      col("doc_id").cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("order_hash"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), shard.cast("long").as("shard"),
        orderHash.as("order_hash"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
  }

  /** Deterministic stratified sampling: each source stratum keeps a
    * fixed rate (25/50/75/100% cycling by source index), decided by a
    * content-independent md5 bucket of the doc key — the same rows
    * survive on every engine and every run, no RNG state, and the
    * decision is row-local (zero shuffles at any scale).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val bucket = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    val rate = lit(25) + (substring(col("source"), 4, 10).cast("int") % 4) * lit(25)
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      bucket.cast("long").as("bucket"),
      rate.cast("long").as("rate_pct"),
      (bucket < rate).as("sampled"))
  }

  /** Zipf fit per language (dataset-card statistic): least-squares
    * slope/intercept of log10(freq) vs log10(rank) over each lang's
    * top-100 terms, plus type/token totals. Natural text sits near
    * slope −1; a corpus far off is synthetic, templated, or
    * degenerate. Two-phase word count (one token shuffle), per-lang
    * rank window over the SMALL (lang, term, n) aggregate, and the
    * regression folds as DECIMAL(38,18) sums — exact and commutative,
    * so the fit cannot drift with partial-aggregation order and
    * hash-matches the DuckDB oracle bit for bit.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val d3818 = org.apache.spark.sql.types.DecimalType(38, 18)
    val tf = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFns.tokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
    // ONE pass over the (lang, term, n) aggregate yields both the
    // corpus totals and the top-100 regression terms (conditional
    // sums under the rank) — a separate totals branch would re-scan
    // and re-tokenize the whole corpus, the dominant cost at scale.
    // The window ranks each lang's vocabulary, which is orders of
    // magnitude smaller than the corpus itself.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("term"))
    val inTop = col("rank") <= 100
    val x = log10(col("rank").cast("double"))
    val y = log10(col("n").cast("double"))
    def topSum(c: Column, name: String): Column =
      sum(when(inTop, c).otherwise(lit(0d)).cast(d3818)).cast("double").as(name)
    val reg = tf.withColumn("rank", row_number().over(w))
      .groupBy("lang").agg(
        count(lit(1)).as("n_types"),
        sum(col("n")).as("n_tokens"),
        sum(when(inTop, lit(1L)).otherwise(lit(0L))).cast("double").as("k"),
        topSum(x, "sx"), topSum(y, "sy"),
        topSum(x * x, "sxx"), topSum(x * y, "sxy"))
    val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
      (col("k") * col("sxx") - col("sx") * col("sx"))
    // A lang with a single distinct term has k=1 and x=log10(1)=0, so the
    // slope denominator is exactly 0 — emit null rather than NaN/Infinity
    // (which DuckDB renders differently and would break the bit-exact oracle).
    val fittable = col("k") >= 2
    reg.select(col("lang"), col("n_types"), col("n_tokens"),
      when(fittable, round(slope, 4)).as("zipf_slope"),
      when(fittable, round((col("sy") - slope * col("sx")) / col("k"), 4))
        .as("zipf_intercept"))
  }
}
