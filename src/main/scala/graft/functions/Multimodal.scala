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

  override def ops: Seq[Op] = Seq(
    Op("mm_binary_meta", binaryMeta, Some(binaryMetaSql)))
}
