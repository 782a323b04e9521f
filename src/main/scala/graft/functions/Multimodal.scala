package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables

/** Multimodal column plumbing (north-star addition): treat media as an
  * opaque `binary` payload column plus typed metadata. The Spark-side
  * pipeline — binary column, content digest, per-payload metadata — is
  * real; the image/audio DECODE step is STUBBED with a deterministic
  * fake (this container has no media libraries): fake width/height/
  * frame-count are pure functions of the payload length. At scale the
  * stub is replaced by a `mapPartitions` decoder over the same schema;
  * everything around it (columns, digests, partitioning) is unchanged.
  */
object Multimodal extends OpFamily {

  private def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .withColumn("width", lit(64L) + col("byte_len") % 577)
      .withColumn("height", lit(64L) + (col("byte_len") * 31) % 577)
      .withColumn("n_frames", col("byte_len") % 7 + 1)

  private val binaryMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS sha,
      |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 577 AS width,
      |  64 + (CAST(octet_length(encode(text)) AS BIGINT) * 31) % 577 AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) % 7 + 1 AS n_frames
      |FROM documents""".stripMargin

  // X2: frame/chunk sampling — the "decode every Nth video frame"
  // access pattern over an opaque payload, kept fully distributed: the
  // frame plan (offsets/lengths) is computed relationally with
  // posexplode, and only sampled byte ranges are touched. The chunk
  // checksum stands in for the decoded frame (no media libs here); a
  // real decoder drops into the same per-chunk slot via mapPartitions.
  private def frameSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .withColumn("n_frames", expr("(len - 1) div 1000 + 1"))
      .select(col("doc_id"), col("text"), col("len"),
        posexplode(expr("sequence(0, cast(n_frames - 1 as int))")))
      .filter(col("pos") % 3 === 0)
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_id"),
        (col("pos") * 1000L).as("offset"),
        least(lit(1000L), col("len") - col("pos") * 1000L).as("frame_len"),
        md5(expr("substr(text, pos * 1000 + 1, least(1000, len - pos * 1000))")).as("chk"))

  private val frameSampleSql =
    """WITH b AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
      |    (CAST(length(text) AS BIGINT) - 1) // 1000 + 1 AS n_frames
      |  FROM documents),
      |f AS (SELECT doc_id, text, len, unnest(range(0, n_frames)) AS pos FROM b)
      |SELECT doc_id, CAST(pos AS BIGINT) AS frame_id, pos * 1000 AS offset,
      |  least(1000, len - pos * 1000) AS frame_len,
      |  md5(substring(text, CAST(pos * 1000 + 1 AS INT), CAST(least(1000, len - pos * 1000) AS INT))) AS chk
      |FROM f WHERE pos % 3 = 0""".stripMargin

  // X3: feature extraction stub — payload → fixed-width feature vector
  // (the "embed every image" step). The real encoder is STUBBED with a
  // deterministic hash-derived projection (8 dims from salted content
  // digests, scaled to [-1, 1)); schema, determinism, and the one-pass
  // distributed shape are the real thing. Features are emitted as
  // scalar columns f0..f7 (engine-neutral comparison).
  private def featureExtract(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("sha"))
    val feats = (0 until 8).map { k =>
      (expr(s"cast(conv(substr(md5(concat('$k:', sha)), 1, 8), 16, 10) as bigint) % 2000 - 1000")
        .cast("double") / lit(1000.0)).as(s"f$k")
    }
    base.select(col("doc_id") +: feats: _*)
  }

  // hex→int without conv(): Σ nibble_i · 16^(8-i) over the first 8 hex
  // chars (same value conv() parses)
  private def hexSql(e: String): String =
    s"CAST(list_sum(list_transform(range(1, 9), i -> " +
      s"(strpos('0123456789abcdef', substr($e, CAST(i AS INT), 1)) - 1) * CAST(pow(16, 8 - i) AS BIGINT))) AS BIGINT)"

  private val featureExtractSql = {
    val feats = (0 until 8).map { k =>
      s"  CAST(${hexSql(s"md5('$k:' || sha)")} % 2000 - 1000 AS DOUBLE)/1000.0 AS f$k"
    }.mkString(",\n")
    s"""WITH b AS (SELECT doc_id, sha256(text) AS sha FROM documents)
       |SELECT doc_id,
       |$feats
       |FROM b""".stripMargin
  }

  // X5: payload → embedding → ANN index row. Composes the X3 feature
  // stub with the similarity kernels: quantize to exact int64, exact
  // norm (LongDotProduct), hyperplane-LSH bucket (LshBucket codegen
  // kernel — 8-dim vectors use the first 8 plane weights on both
  // engines). The output IS a multimodal ANN index: partition/bucket
  // by `bucket` and S2-style probes search 1/256 of the media corpus.
  private def embedAnn(s: SparkSession, d: String): DataFrame = {
    val fv = array((0 until 8).map(k => col(s"f$k")): _*)
    featureExtract(s, d)
      .select(col("doc_id"), Similarity.quantize(fv).as("v"))
      .select(col("doc_id"),
        Similarity.sqNorm(col("v")).as("nn"),
        Similarity.lshBucket(col("v")).as("bucket"))
  }

  private val embedAnnSql = {
    val fv = (0 until 8).map(k =>
      s"CAST(${hexSql(s"md5('$k:' || sha)")} % 2000 - 1000 AS DOUBLE)/1000.0").mkString("[", ", ", "]")
    s"""WITH b AS (SELECT doc_id, sha256(text) AS sha FROM documents),
       |f AS (SELECT doc_id, $fv AS fv FROM b),
       |q AS (SELECT doc_id, ${Similarity.quantizeSql("fv")} AS v FROM f)
       |SELECT doc_id, ${Similarity.sqNormSql("v")} AS nn,
       |  ${Similarity.lshBucketSql("v")} AS bucket
       |FROM q""".stripMargin
  }

  // X6 `mm_dedup`: the exact-binary-dedup STORAGE LEDGER per source —
  // the blob-store accounting every multimodal ingest runs first
  // (identical images/audio re-crawled under different ids dominate
  // raw media corpora). Unlike D1 (text identity) this keys on the
  // content DIGEST of the opaque bytes: per source — payloads, unique
  // blobs, duplicate copies, and the byte volume dedup reclaims. Two
  // hash-aggs: (source, sha) then source; the first's 256-bit digest
  // key is uniform so the shuffle cannot skew no matter how
  // duplicated the corpus is, the second's output is |sources| rows.
  private def mmDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), sha2(col("text").cast("binary"), 256).as("sha"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .groupBy("source", "sha")
      .agg(count(lit(1)).as("n"), max(col("byte_len")).as("blen"))
      .groupBy("source")
      .agg(sum(col("n")).as("n_payloads"),
        count(lit(1)).as("n_unique"),
        sum(col("n") - 1).as("n_dup_copies"),
        sum(col("n") * col("blen")).as("total_bytes"),
        sum((col("n") - 1) * col("blen")).as("reclaimable_bytes"))

  private val mmDedupSql =
    """WITH g AS (
      |  SELECT source, sha256(text) AS sha, count(*) AS n,
      |    max(CAST(octet_length(encode(text)) AS BIGINT)) AS blen
      |  FROM documents GROUP BY 1, 2)
      |SELECT source,
      |  CAST(sum(n) AS BIGINT) AS n_payloads,
      |  count(*) AS n_unique,
      |  CAST(sum(n - 1) AS BIGINT) AS n_dup_copies,
      |  CAST(sum(n * blen) AS BIGINT) AS total_bytes,
      |  CAST(sum((n - 1) * blen) AS BIGINT) AS reclaimable_bytes
      |FROM g GROUP BY 1""".stripMargin

  // X7 `mm_frame_dedup`: dedup at the FRAME level — the pass video
  // pipelines run below X6's whole-payload identity (intros, logos,
  // and black frames repeat across files that are NOT duplicates of
  // each other). Every fixed-size chunk's checksum goes through one
  // hash-agg on the uniform digest key; a checksum seen ≥2 times is a
  // repeated frame, reported with its copy/doc counts and the
  // canonical earliest (doc, frame) keeper — packed into one int64
  // (doc·10⁶ + frame, frames bounded by payload size) so the argmin
  // is a plain min, no join-back. The chunk explode is O(corpus
  // bytes / chunk) rows — the X2 plan shape, all map-side until the
  // digest shuffle.
  /** The frame-dedup core over any (doc_id, text) frame — separated so
    * specs can drive it with synthetic payloads carrying known repeated
    * chunks (the generated corpus has no full-chunk duplicates below
    * sf0.1). */
  private[graft] def frameDedupOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .withColumn("n_frames", expr("(len - 1) div 1000 + 1"))
      .select(col("doc_id"), col("text"), col("len"),
        posexplode(expr("sequence(0, cast(n_frames - 1 as int))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(expr("substr(text, pos * 1000 + 1, least(1000, len - pos * 1000))")).as("chk"))
      .groupBy("chk")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id") * 1000000L + col("pos")).as("kp"))
      .filter(col("n_copies") >= 2)
      .select(col("chk"), col("n_copies"), col("n_docs"),
        expr("kp div 1000000").as("keep_doc_id"),
        (col("kp") % 1000000L).as("keep_frame_id"))

  private def mmFrameDedup(s: SparkSession, d: String): DataFrame =
    frameDedupOf(Tables.documents(s, d))

  private val mmFrameDedupSql =
    """WITH b AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
      |    (CAST(length(text) AS BIGINT) - 1) // 1000 + 1 AS n_frames
      |  FROM documents),
      |f AS (SELECT doc_id, text, len, unnest(range(0, n_frames)) AS pos FROM b),
      |c AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    md5(substring(text, CAST(pos * 1000 + 1 AS INT),
      |      CAST(least(1000, len - pos * 1000) AS INT))) AS chk
      |  FROM f),
      |g AS (
      |  SELECT chk, count(*) AS n_copies,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    CAST(min(doc_id * 1000000 + pos) AS BIGINT) AS kp
      |  FROM c GROUP BY 1)
      |SELECT chk, n_copies, n_docs,
      |  kp // 1000000 AS keep_doc_id, kp % 1000000 AS keep_frame_id
      |FROM g WHERE n_copies >= 2""".stripMargin

  // X8 `mm_format_sniff`: container-format SNIFFING over the opaque
  // payload — the classification/dead-letter pass a multimodal lake
  // runs at ingestion, where the claimed format (file extension,
  // upstream metadata) is never trusted and the MAGIC BYTES decide
  // which decoder pool a payload routes to (and "unknown" routes to
  // quarantine, the C10 contract for media). The synthetic corpus
  // carries no organic containers, so — the T11 injected-PII pattern —
  // both engines first PREPEND a deterministic doc_id-derived magic
  // (3 of 4 docs get PNG8/RIFF/JPEG, every 4th gets none ⇒ sniffs
  // UNKNOWN), then sniff the prefix back and aggregate the routing
  // report per (format, source): payload count, byte mass, size
  // bounds. One scan, one bounded hash-agg (|formats|×|sources|
  // rows); prefix extraction is codegen'd substring — no UDF, no
  // decode.
  private def formatSniff(s: SparkSession, d: String): DataFrame = {
    val magic = when(pmod(col("doc_id"), lit(4L)) === 0, lit("PNG8"))
      .when(pmod(col("doc_id"), lit(4L)) === 1, lit("RIFF"))
      .when(pmod(col("doc_id"), lit(4L)) === 2, lit("JPEG"))
      .otherwise(lit(""))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        concat(magic, col("text")).cast("binary").as("payload"))
      .withColumn("prefix", expr("cast(substring(payload, 1, 4) as string)"))
      .withColumn("format",
        when(col("prefix") === "PNG8", "png")
          .when(col("prefix") === "RIFF", "riff")
          .when(col("prefix") === "JPEG", "jpeg")
          .otherwise("unknown"))
      .groupBy("format", "source")
      .agg(count(lit(1)).as("n_payloads"),
        sum(length(col("payload")).cast("long")).as("bytes"),
        min(length(col("payload")).cast("long")).as("min_len"),
        max(length(col("payload")).cast("long")).as("max_len"))
  }

  private val formatSniffSql =
    """WITH p AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 4 = 0 THEN 'PNG8'
      |         WHEN doc_id % 4 = 1 THEN 'RIFF'
      |         WHEN doc_id % 4 = 2 THEN 'JPEG'
      |         ELSE '' END || text AS payload
      |  FROM documents),
      |c AS (
      |  SELECT source, octet_length(encode(payload)) AS len,
      |    CASE substring(payload, 1, 4)
      |      WHEN 'PNG8' THEN 'png' WHEN 'RIFF' THEN 'riff'
      |      WHEN 'JPEG' THEN 'jpeg' ELSE 'unknown' END AS format
      |  FROM p)
      |SELECT format, source, count(*) AS n_payloads,
      |  CAST(sum(len) AS BIGINT) AS bytes,
      |  CAST(min(len) AS BIGINT) AS min_len,
      |  CAST(max(len) AS BIGINT) AS max_len
      |FROM c GROUP BY 1, 2""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("mm_format_sniff", formatSniff, Some(formatSniffSql)),
    Op("mm_frame_dedup", mmFrameDedup, Some(mmFrameDedupSql)),
    Op("mm_dedup", mmDedup, Some(mmDedupSql)),
    Op("mm_binary_meta", binaryMeta, Some(binaryMetaSql)),
    Op("mm_frame_sample", frameSample, Some(frameSampleSql)),
    Op("mm_feature_extract", featureExtract, Some(featureExtractSql)),
    Op("mm_embed_ann", embedAnn, Some(embedAnnSql)))

  /** The decoder slot: batch media decode over binary payloads via
    * `mapPartitions` — one decoder instance per partition (the pattern
    * for model/codec reuse), deterministic stub in place of the codec.
    * At scale the stub body is the only thing that changes. */
  final case class DecodedFrame(doc_id: Long, width: Int, height: Int, checksum: String)

  def decodePartitions(s: SparkSession, d: String): org.apache.spark.sql.Dataset[DecodedFrame] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init happens here, once
        val codecSeed = 0x5eed
        it.map { case (id, bytes) =>
          DecodedFrame(id, 64 + (bytes.length ^ codecSeed) % 577,
            64 + bytes.length % 577,
            java.security.MessageDigest.getInstance("MD5")
              .digest(bytes).map("%02x".format(_)).mkString)
        }
      }
  }
}
