package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 sixth wave (live pathing, the
  * LSH band-shape sweep). */
class Round8fSpec extends SparkSpec {

  test("stream_pathing: live path grid equals the batch lead-window view exactly") {
    val streamed = run("stream_pathing")
    val batch = run("behavior_pathing")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed trigram grid diverges from the batch view")
  }

  test("dedup_band_sweep: truth is config-independent, counters exact and bounded") {
    val rows = run("dedup_band_sweep").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_true")).distinct.length == 1,
      "ground truth must not depend on the candidate shape")
    rows.foreach { r =>
      val (t, c, h) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_hit"))
      assert(h <= math.min(t, c))
      assert(c >= 1L, s"config ${r.getAs[String]("config")} generated no candidates")
      assert(r.getAs[Long]("recall_e4") == 10000L * h / t)
      assert(r.getAs[Long]("precision_e4") == 10000L * h / c)
    }
    // every hit must really be a candidate pair of its config — spot
    // check the production shape against the standalone D5 generator
    val cand16 = graft.functions.Dedup.embCandidates(spark, sf, 16, 6)
    val verified = run("dedup_embedding").select("vec_a", "vec_b")
    assert(verified.join(cand16, Seq("vec_a", "vec_b"), "left_anti").count() == 0L,
      "D5's verified pairs must be a subset of its own candidate set")
  }
}
