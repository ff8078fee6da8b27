package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with feature extraction running as a distributed typed
  * mapPartitions batch (the shape a real per-partition decoder —
  * image/audio/video libraries — would plug into).
  *
  * The decode step is STUBBED deterministically (this container has no
  * media libraries): byte length, content hash, and fake geometry
  * derived from the payload. The Spark-side plumbing — schema, binary
  * encoding, partition batching, typed Encoders — is real.
  */
object Multimodal {

  case class MMRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MMFeatures(doc_id: Long, mime: String, byte_len: Long,
                        content_hash: String, fake_width: Long, fake_frames: Long)

  /** Binary-payload table synthesized from documents (payload = utf-8
    * bytes of the text; in production this is the image/audio blob).
    */
  def payloads(spark: SparkSession, dir: String): Dataset[MMRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MMRecord]
  }

  /** Frame sampling: every `stride`-th fixed-size window of each
    * document becomes one frame row with a per-frame feature — the
    * 1-row→k-rows explode shape of video frame extraction (decode,
    * sample every Nth frame, embed each). The decode/embed stubs are
    * deterministic (window slice + md5 — a real pipeline plugs its
    * decoder into [[mmFeatures]]'s mapPartitions batch instead); the
    * PLAN is the part that matters at 100 TB: a pure
    * projection+generate, whole-stage codegen'd, ZERO shuffles — frame
    * explosion multiplies rows ~25× here, and doing it without a
    * single exchange is what keeps it linear.
    */
  def mmFrames(spark: SparkSession, dir: String, frameChars: Int = 256,
               stride: Int = 4): DataFrame = {
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("nf",
        ceil(length(col("text")) / lit(frameChars.toDouble)).cast("long"))
      .filter(col("nf") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("nf") - 1, lit(stride.toLong))))
      .withColumn("frame",
        expr(s"substring(text, cast(frame_idx * $frameChars + 1 as int), $frameChars)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame").cast("binary")).as("frame_hash"))
  }

  /** Feature extraction over payload batches. Each partition processes
    * its records as one batch — the place a real decoder would be
    * initialized once per partition and fed the batch.
    */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).mapPartitions { batch =>
      // STUB decode: a real implementation decodes payload bytes here
      // (per-partition decoder init, then per-record decode).
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val len = r.payload.length.toLong
        digest.reset()
        val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
        MMFeatures(r.doc_id, r.mime, len, hash, 64L + len % 640L, 1L + len % 30L)
      }
    }.toDF()
  }
}
