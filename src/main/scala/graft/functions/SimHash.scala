package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables

/** D4: SimHash near-dup detection.
  *
  * Each token hashes to 60 bits (15 md5 hex nibbles — 60, not 64, so
  * the signature stays a positive int64 in every engine). Per bit, set
  * bits vote +1 and clear bits −1 across the document's tokens; the
  * signature bit is 1 iff the vote sum is positive (ties → 0, a
  * deterministic rule both engines share). Near-dup candidates are
  * pairs sharing any of the 4 fifteen-bit bands (the same
  * LSH-banding trick as MinHash, so the pair search is an equi-join,
  * never O(n²)); the verify stage keeps pairs with Hamming distance
  * ≤ 8 via bit_count(xor).
  */
object SimHash extends OpFamily {

  private[graft] def simhashDf(s: SparkSession, d: String): DataFrame = {
    // One row per token, the 60 hash bits packed into a single int64
    // (15 hex nibbles, first nibble = bits 59..56 — the same bit order
    // the oracle derives nibble-by-nibble). 60 conditional sums then
    // vote per bit in ONE hash aggregation — no (token × bit) row
    // explosion, which is a 60× input blow-up at any scale.
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
        expr("cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)").as("tb"))
    val voteAggs = (0 until 60).map(j =>
      sum(expr(s"2 * ((tb >> ${59 - j}) & 1) - 1")).as(s"v$j"))
    val votes = tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
    val shBits = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    votes.select(col("doc_id"), shBits.reduce(_ + _).as("sh"))
  }

  // CTE names are prefixed s* so this bundle composes with Dedup's
  // shingle/band CTEs inside one WITH (the Clusters oracle needs both).
  private[functions] val simhashCte =
    """stok AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
      |svotes AS (
      |  SELECT doc_id, j,
      |    CASE WHEN (strpos('0123456789abcdef', substr(h, 1 + CAST(j // 4 AS INT), 1)) - 1)
      |      // CAST(pow(2, 3 - j % 4) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS v
      |  FROM stok, range(0, 60) r(j)),
      |sbits AS (
      |  SELECT doc_id, CASE WHEN CAST(sum(v) AS BIGINT) > 0
      |    THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END AS b
      |  FROM svotes GROUP BY doc_id, j),
      |sig AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS sh FROM sbits GROUP BY doc_id)""".stripMargin

  // candidate pairs via 4 × 15-bit bands, verified by Hamming ≤ 8.
  // The raw variant stops before the cross-band distinct — hamming is a
  // deterministic function of the pair, so filter-then-distinct equals
  // distinct-then-filter, and the closure pipeline (Clusters.pairLabels)
  // contracts the raw stream in-task instead of paying the
  // explicit-pair-set shuffle (the round-10 scale fix).
  private[graft] def simhashPairsRaw(s: SparkSession, d: String): DataFrame = {
    val sig = simhashDf(s, d).cache()
    val bands = sig.select(col("doc_id"), col("sh"),
        posexplode(expr("transform(sequence(0, 3), k -> (sh div cast(pow(2, 15*k) as bigint)) % 32768)")))
      .select(col("doc_id"), col("sh"), col("pos").as("band"), col("col").as("bv"))
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sh ^ b.sh)").cast("long").as("hamming"))
      .filter(col("hamming") <= 8)
  }

  private[graft] def simhashPairs(s: SparkSession, d: String): DataFrame =
    simhashPairsRaw(s, d).distinct()

  /** CTE bundle ending in `spairs(doc_a, doc_b)` — the Hamming-verified
    * D4 pairs; shared with the cluster-resolution oracle ([[Clusters]]). */
  private[functions] def pairsCtes: String =
    s"""$simhashCte,
       |sbands AS (
       |  SELECT doc_id, sh, k AS band,
       |    (sh // CAST(pow(2, 15*k) AS BIGINT)) % 32768 AS bv
       |  FROM sig, range(0, 4) r(k)),
       |spairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |  FROM sbands a JOIN sbands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 8)""".stripMargin

  private val simhashPairsSql =
    s"""WITH $pairsCtes
       |SELECT doc_a, doc_b, hamming FROM spairs""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("dedup_simhash", simhashPairs, Some(simhashPairsSql)))
}
