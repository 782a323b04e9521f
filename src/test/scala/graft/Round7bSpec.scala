package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 second wave (exact similarity
  * join, LSH recall eval, streaming gap tracking). */
class Round7bSpec extends SparkSpec {

  test("dedup_exact_join: threshold exact, exhaustive over LSH-verified pairs, dups at J=1") {
    val truth = run("dedup_exact_join").cache()
    truth.collect().foreach { r =>
      val (i, u) = (r.getAs[Long]("inter_n"), r.getAs[Long]("union_n"))
      assert(2L * i >= u, s"pair below tau=0.5 leaked: $i/$u")
      assert(i <= u)
    }
    // exhaustiveness cross-check against the INDEPENDENT D3 path: every
    // LSH-candidate pair whose exact Jaccard reaches 0.5 must be found
    // by the prefix-filter join too (truth is a superset of that set)
    val d3 = run("ngram_jaccard")
      .filter(lit(2L) * col("inter_n") >= col("union_n"))
      .select("doc_a", "doc_b")
    val missed = d3.join(truth.select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0L, s"$missed D3-verified pairs missing from the exact join")
    // exact duplicates (identical text) are J=1 pairs: inter == union
    val dupPairs = truth.filter(col("inter_n") === col("union_n")).count()
    val dupDocs = run("dedup_exact").filter(col("n_copies") > 1)
    if (dupDocs.count() > 0) assert(dupPairs > 0L,
      "corpus has exact duplicates but the join found no J=1 pair")
  }

  test("dedup_recall: counters reconcile with the frames they summarize") {
    val r = run("dedup_recall").collect()(0)
    val (nTrue, nCand, nHit) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(nHit <= math.min(nTrue, nCand))
    assert(r.getAs[Long]("recall_e4") == 10000L * nHit / nTrue)
    assert(r.getAs[Long]("precision_e4") == 10000L * nHit / nCand)
    // independent recount from the two source frames
    val truth = run("dedup_exact_join").select("doc_a", "doc_b")
    val cand = run("dedup_minhash_lsh").select("doc_a", "doc_b")
    assert(truth.count() == nTrue)
    assert(cand.count() == nCand)
    assert(truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count() == nHit)
    // the 4x4 band shape sits at tau~0.7: against a 0.5 truth it must
    // find the high-J pairs (exact dups are always candidates) without
    // being vacuously perfect on precision
    assert(nHit > 0L)
    assert(nCand > nHit, "LSH candidates should include sub-threshold pairs")
  }

  test("es_watermark_sweep: monotone in the watermark and equal to a driver-side replay") {
    val rows = run("es_watermark_sweep").collect()
      .map(r => (r.getAs[Long]("wm_s"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_events"), r.getAs[Long]("drop_e6")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(60L, 300L, 900L, 3600L, 21600L))
    assert(rows.map(_._3).distinct.size == 1, "n_events must be constant across rows")
    // a larger watermark can only drop fewer events
    rows.map(_._2).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(1) <= w(0), s"drop counts not monotone: $rows")
    }
    rows.foreach { case (_, d, n, e6) => assert(e6 == 1000000L * d / n) }
    // independent replay: global running max in arrival (event_id) order
    val log = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var hwm = Long.MinValue
    val late = log.map { case (_, us) =>
      val l = if (hwm > us) hwm - us else 0L
      hwm = math.max(hwm, us); l
    }
    rows.foreach { case (wm, d, n, _) =>
      assert(n == log.length.toLong)
      assert(d == late.count(_ > wm * 1000000L).toLong,
        s"watermark ${wm}s drop count mismatch")
    }
  }

  test("stream_gaps equals the batch signal_gaps view row-for-row") {
    val batch = run("signal_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stream = run("stream_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
