package graft

import org.apache.spark.sql.functions._

/** The 16-bit packed vector wire format (round 10): band joins ship
  * quantized embeddings as 2-byte lanes instead of `array<bigint>`
  * (~4× fewer shuffle bytes) — valid only because the packed dot
  * product is the SAME int64 arithmetic over the same values. These
  * checks pin that bit-identity; the end-to-end proof is the
  * unchanged dedup_embedding / dedup_semantic driver oracles, which
  * close over the explicit pair set with exact cos_sim.
  */
class PackedVecSpec extends SparkSpec {

  import graft.functions.Similarity

  private val rnd = new scala.util.Random(421)
  private def randVec(n: Int): Seq[Long] =
    Seq.fill(n)((rnd.nextInt(65536) - 32768).toLong)

  test("packed dot product is bit-identical to the long-array dot") {
    import spark.implicits._
    val cases = (1 to 40).map { i =>
      val n = 1 + rnd.nextInt(96)
      (randVec(n), randVec(n))
    } :+ ((Seq(-32768L, 32767L, 0L, 1L), Seq(32767L, -32768L, 5L, -1L)))
    val df = cases.toDF("a", "b")
    val bad = df.select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.packedDot(Similarity.packShorts(col("a")),
          Similarity.packShorts(col("b"))).as("pd"))
      .filter(col("d") =!= col("pd")).count()
    assert(bad == 0L)
  }

  test("cosinePacked equals cosine exactly (same int64 dot, same sqrt)") {
    import spark.implicits._
    // realistic quantized range (±1000-ish thousandths of unit floats):
    // full-int16 lanes would overflow na*nb in the UNPACKED reference
    // cosine too — the packed path changes nothing about that envelope
    def qVec(n: Int): Seq[Long] = Seq.fill(n)((rnd.nextInt(2201) - 1100).toLong)
    val cases = (1 to 40).map(_ => (qVec(64), qVec(64)))
    val df = cases.toDF("a", "b")
      .withColumn("na", Similarity.sqNorm(col("a")))
      .withColumn("nb", Similarity.sqNorm(col("b")))
    val bad = df.select(
        Similarity.cosine(col("a"), col("b"), col("na"), col("nb")).as("c"),
        Similarity.cosinePacked(
          Similarity.packShorts(col("a")), Similarity.packShorts(col("b")),
          col("na"), col("nb")).as("pc"))
      .filter(col("c") =!= col("pc")).count()
    assert(bad == 0L)
  }

  test("PackShorts refuses out-of-range components instead of truncating") {
    import spark.implicits._
    val df = Seq(Seq(1L, 40000L)).toDF("v")
    val e = intercept[Exception] {
      df.select(Similarity.packShorts(col("v"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("int16 range")))
  }

  test("packed bytes are 2 per lane, little-endian") {
    import spark.implicits._
    val r = Seq(Seq(1L, -1L, 258L)).toDF("v")
      .select(Similarity.packShorts(col("v"))).head.getAs[Array[Byte]](0)
    assert(r.length == 6)
    assert(r(0) == 1.toByte && r(1) == 0.toByte)       // 1
    assert(r(2) == -1.toByte && r(3) == -1.toByte)     // -1 = 0xffff
    assert(r(4) == 2.toByte && r(5) == 1.toByte)       // 258 = 0x0102
  }
}
