package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 fifth wave (probe-recall curve,
  * per-user burst detection, live forecast scoring). */
class Round8eSpec extends SparkSpec {

  test("ann_probe_sweep: recall is monotone in probes and agrees with ann_recall at its point") {
    val sweep = run("ann_probe_sweep").collect()
      .map(r => (r.getAs[Long]("probes"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("recall_e4")))
      .sortBy(_._1)
    assert(sweep.map(_._1).toSeq == Seq(1L, 2L, 4L))
    assert(sweep.map(_._2).distinct.size == 1, "ground truth is probe-independent")
    sweep.foreach { case (_, t, h, r) =>
      assert(h <= t); assert(r == 10000L * h / t)
    }
    // probing more cells can only find more of the truth
    sweep.map(_._3).sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0) <= w(1), "recall decreased with more probes")
    }
    // the probes=1 point must equal S9's aggregate recall
    val s9 = run("ann_recall")
      .agg(sum("n_true").as("t"), sum("n_hit").as("h")).collect()(0)
    assert(sweep.head._2 == s9.getAs[Long]("t") && sweep.head._3 == s9.getAs[Long]("h"))
  }

  test("behavior_anomaly: flags exactly the >3-sigma burst days on a synthetic grid") {
    import spark.implicits._
    // user 1: flat 10s plus one 100-burst; user 2: perfectly flat.
    // A single outlier over D-1 flat days sits at exactly (v−μ)²/σ² =
    // D−1, so D must exceed 10 for a STRICT >9 (3σ) flag — 12 days.
    val flat = (0L until 11L).map(d => (1L, d, 10L)) :+ ((1L, 11L, 100L))
    val quiet = (0L until 12L).map(d => (2L, d, 10L))
    val grid = (flat ++ quiet).toDF("user_id", "day", "n")
    val got = graft.operators.Behavioral.anomalyDays(grid)
      .select("user_id", "day").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 11L)), s"expected only the burst day, got ${got.toSeq}")
    // int64-overflow regime (r7 advisor): per-user totals past ~3e9 make
    // the S² / D·Q cross-multiply terms exceed Long.MaxValue; the
    // decimal(38,0) arithmetic must still flag exactly the burst day
    // where a wrapped int64 compare could flip the verdict
    val big = (0L until 11L).map(d => (3L, d, 500000000L)) :+ ((3L, 11L, 600000000L))
    val gotBig = graft.operators.Behavioral.anomalyDays(big.toDF("user_id", "day", "n"))
      .select("user_id", "day").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotBig.toSet == Set((3L, 11L)),
      s"overflow-regime burst misflagged: ${gotBig.toSeq}")
    // and on the real corpus the op at least runs with bounded output
    val real = run("behavior_anomaly")
    assert(real.count() >= 0L)
    real.collect().foreach { r =>
      assert(r.getAs[Long]("n_events") * r.getAs[Long]("n_active_days")
        > r.getAs[Long]("total_events"), "flagged day must be above its own mean")
    }
  }

  test("stream_forecast: live scoring equals the batch eval grid exactly") {
    val streamed = run("stream_forecast")
    val batch = run("metric_forecast")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed forecast grid diverges from the batch eval")
  }
}
