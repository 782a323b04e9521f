package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 ninth wave (frame-level dedup,
  * the contamination threshold sweep). */
class Round8iSpec extends SparkSpec {

  test("mm_frame_dedup: keeper is a real frame of its group, counts bounded") {
    val g = run("mm_frame_dedup").cache()
    g.collect().foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2L)
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies"))
      assert(r.getAs[Long]("keep_frame_id") >= 0L)
    }
    // the keeper doc really contains the checksum at the keeper frame
    val one = g.orderBy("chk").collect()(0)
    val doc = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") === one.getAs[Long]("keep_doc_id"))
      .select("text").collect()(0).getString(0)
    val off = one.getAs[Long]("keep_frame_id").toInt * 1000
    val chunk = doc.substring(off, math.min(off + 16, doc.length))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md == one.getAs[String]("chk"), "keeper frame does not hash to its group's checksum")
  }

  test("corpus_contamination_sweep: monotone in the threshold, exact at tau=5 vs P1") {
    val rows = run("corpus_contamination_sweep").collect()
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_docs_flagged"),
        r.getAs[Long]("n_tokens_flagged"), r.getAs[Long]("n_docs")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 5L, 10L, 20L))
    assert(rows.map(_._4).distinct.size == 1)
    // a stricter threshold can only flag fewer docs/tokens
    rows.sliding(2).foreach { w =>
      if (w.size == 2) {
        assert(w(0)._2 >= w(1)._2); assert(w(0)._3 >= w(1)._3)
      }
    }
    // the production threshold's row equals P1's verdict count
    val p1 = run("decontaminate").filter(col("contaminated")).count()
    assert(rows.find(_._1 == 5L).get._2 == p1,
      "sweep at tau=5 disagrees with the decontaminate gate")
  }
}
