package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 ninth wave (frame-level dedup,
  * the contamination threshold sweep). */
class Round8iSpec extends SparkSpec {

  test("mm_frame_dedup: corpus count matches an independent recount; synthetic dups detected") {
    // corpus path: the reported group count equals a direct recount of
    // full-chunk checksums seen >= 2 times (zero below sf0.1 — the
    // checksum is now frame IDENTITY, not a 16-char prefix)
    val g = run("mm_frame_dedup").cache()
    val expected = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"))
      .withColumn("n_frames", expr("(len - 1) div 1000 + 1"))
      .select(col("doc_id"), col("text"), col("len"),
        posexplode(expr("sequence(0, cast(n_frames - 1 as int))")))
      .select(md5(expr("substr(text, pos * 1000 + 1, least(1000, len - pos * 1000))")).as("chk"))
      .groupBy("chk").count().filter(col("count") >= 2).count()
    assert(g.count() == expected, "group count differs from a direct recount")
    g.collect().foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2L)
      assert(r.getAs[Long]("n_docs") >= 1L && r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies"))
      assert(r.getAs[Long]("keep_frame_id") >= 0L)
    }
    // positive path on synthetic payloads: a 1000-char block repeated in
    // two docs (at different frame slots) groups; distinct frames that
    // merely SHARE a 16-char prefix must NOT (the r7 advisor's false
    // positive)
    import spark.implicits._
    val block = "z" * 1000
    val pre = "samePrefix16Char"
    val docs = Seq(
      (1L, block + (pre + "a" * 984)),         // frames: block, preA
      (2L, ("x" * 1000) + block),              // frames: x1000, block
      (3L, pre + "b" * 984)                    // frame: preB (prefix-collides with preA)
    ).toDF("doc_id", "text")
    val got = graft.functions.Multimodal.frameDedupOf(docs).collect()
    assert(got.length == 1, s"expected exactly the repeated block to group, got ${got.length}")
    val r = got(0)
    assert(r.getAs[Long]("n_copies") == 2L && r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("keep_doc_id") == 1L && r.getAs[Long]("keep_frame_id") == 0L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(block.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("chk") == md, "group checksum is not the full-chunk md5")
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
