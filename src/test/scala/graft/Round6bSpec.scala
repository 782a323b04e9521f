package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the late-round-6 operators (each also has a
  * full DuckDB oracle entry). */
class Round6bSpec extends SparkSpec {

  test("metric_downsample: candles bound their bucket and tile the log") {
    val df = run("metric_downsample").cache()
    assert(df.agg(sum(col("n"))).head.getLong(0) ==
      graft.sources.Tables.events(spark, sf).count(),
      "candle counts must tile the event log")
    assert(df.filter(col("open_c") < col("min_c") || col("open_c") > col("max_c") ||
      col("close_c") < col("min_c") || col("close_c") > col("max_c")).isEmpty,
      "open/close must lie within [min, max]")
    // replay the busiest bucket: open/close = first/last by (ts, event_id)
    val busiest = df.orderBy(col("n").desc, col("bucket_s")).head
    val (et, b) = (busiest.getAs[String]("event_type"), busiest.getAs[Long]("bucket_s"))
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === et &&
        expr("(cast(floor(unix_timestamp(ts)) as bigint) div 3600) * 3600") === b)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        graft.sources.Tables.cents(col("value")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    assert(evs.head._3 == busiest.getAs[Long]("open_c"))
    assert(evs.last._3 == busiest.getAs[Long]("close_c"))
  }

  test("text_length_hist: docs tile the corpus; token sums respect the power-of-2 bounds") {
    val df = run("text_length_hist").cache()
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) ==
      graft.sources.Tables.documents(spark, sf).count())
    df.collect().foreach { r =>
      val b = r.getAs[Long]("log2_tokens"); val nd = r.getAs[Long]("n_docs")
      val nt = r.getAs[Long]("n_tokens")
      assert(nt >= nd * (1L << b) && nt <= nd * ((1L << (b + 1)) - 1),
        s"bucket $b token sum $nt outside [${nd * (1L << b)}, ${nd * ((1L << (b + 1)) - 1)}]")
    }
  }

  test("dedup_sweep: monotone in the threshold and exactly D3's survivors") {
    val sweep = run("dedup_sweep").collect()
      .map(r => (r.getAs[Long]("threshold_e4"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_dropped"))).sortBy(_._1)
    sweep.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(0)._2 >= w(1)._2, "pair counts must not increase with the threshold")
        assert(w(0)._3 >= w(1)._3, "drop counts must not increase with the threshold")
      }
    }
    // cross-check each point against the verified D3 overlaps
    val d3 = run("ngram_jaccard")
      .select(col("doc_b"), expr("(10000 * inter_n) div union_n").as("j_e4"))
      .cache()
    sweep.foreach { case (t, nPairs, nDropped) =>
      assert(d3.filter(col("j_e4") >= t).count() == nPairs)
      assert(d3.filter(col("j_e4") >= t).select("doc_b").distinct().count() == nDropped)
    }
  }

  test("signal_flap: transitions bounded by run length; flag matches the rule") {
    val df = run("signal_flap").cache()
    assert(df.agg(sum(col("n"))).head.getLong(0) ==
      graft.sources.Tables.events(spark, sf).count())
    assert(df.filter(col("n_transitions") > col("n") - 1).isEmpty,
      "a run of n events has at most n-1 transitions")
    assert(df.filter(col("flapping") =!= (col("n_transitions") >= 4L)).isEmpty)
  }

  test("embedding_drift: halves partition each label and reconcile with embedding_qc") {
    val drift = run("embedding_drift").cache()
    val qc = run("embedding_qc")
      .select(col("label"), col("n_vecs"), col("sum_n2"))
    val joined = drift.join(qc, "label")
    assert(joined.filter(col("n_old") + col("n_new") =!= col("n_vecs")).isEmpty,
      "old + new halves must partition each label's vectors")
    assert(joined.filter(col("sumsq_old") + col("sumsq_new") =!= col("sum_n2")).isEmpty,
      "half norm sums must reconcile with the QC totals")
  }
}
