package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 eleventh wave (conversion-lag
  * distribution, live availability). */
class Round8kSpec extends SparkSpec {

  test("behavior_conversion_lag: buckets tile the signups and bound their lags") {
    val h = run("behavior_conversion_lag").cache()
    val signups = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup").count()
    assert(h.agg(sum("n_signups")).collect()(0).getLong(0) == signups)
    h.collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      if (b >= 0L) {
        val (lo, hi) = (r.getAs[Long]("min_lag_s"), r.getAs[Long]("max_lag_s"))
        // bucket b holds lags with floor(log2(lag+1)) == b
        assert(lo + 1 >= (1L << b) && hi + 1 < (1L << (b + 1)),
          s"bucket $b holds lags outside [2^$b - 1, 2^${b + 1} - 1): $lo..$hi")
      } else {
        assert(r.isNullAt(r.fieldIndex("min_lag_s")),
          "the never-converted bucket has no lags")
      }
    }
  }

  test("stream_availability: live roll-up equals the batch dashboard exactly") {
    val streamed = run("stream_availability")
    val batch = run("metric_availability")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "live availability diverges from the batch roll-up")
  }
}
