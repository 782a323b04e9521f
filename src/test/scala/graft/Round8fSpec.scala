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

  test("dedup_band_sweep: the sampled eval ranks configs exactly as the full truth does") {
    val sim = graft.functions.Similarity
    // FULL exhaustive truth + full candidates, spec-only (the op itself
    // grades a deterministic 50% md5 sample — this proves the sample
    // preserves the tuning DECISION, which is the table's whole point)
    val n = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), sim.quantize(col("embedding")).as("v"))
      .withColumn("nn", sim.sqNorm(col("v")))
      .cache()
    val fullTruth = n.alias("a").join(n.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(sim.cosine(col("a.v"), col("b.v"), col("a.nn"), col("b.nn")) >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .cache()
    val nTrue = fullTruth.count().toDouble
    val fullRanking = Seq((4, 2), (8, 4), (16, 6)).map { case (p, b) =>
      val cand = graft.functions.Dedup.embCandidates(spark, sf, p, b)
      val hit = fullTruth.join(cand, Seq("vec_a", "vec_b"), "left_semi").count()
      (s"${p}x$b", hit / nTrue)
    }.sortBy(-_._2).map(_._1)
    val sampledRanking = run("dedup_band_sweep").collect()
      .map(r => (r.getAs[String]("config"), r.getAs[Long]("recall_e4")))
      .sortBy(-_._2).map(_._1).toSeq
    assert(sampledRanking == fullRanking,
      s"sampled sweep ranks $sampledRanking but full truth ranks $fullRanking")
  }
}
