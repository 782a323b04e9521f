package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 tenth wave (Q13 distribution,
  * availability roll-up, live escalation). */
class Round8jSpec extends SparkSpec {

  test("q13_custdist: histogram mass tiles the customer table, zero bucket kept") {
    val h = run("q13_custdist").cache()
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(h.agg(sum("n_customers")).collect()(0).getLong(0) == nCust)
    // order mass reconciles: sum(k * n_customers) == |orders|
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    val mass = h.select(sum(col("c_orders") * col("n_customers"))).collect()(0).getLong(0)
    assert(mass == nOrders, "order mass lost through the outer join")
  }

  test("metric_availability: hours bounded by span and by 24, grid tiles active days") {
    val a = run("metric_availability").cache()
    a.collect().foreach { r =>
      val (n, span) = (r.getAs[Long]("n_hours"), r.getAs[Long]("span_hours"))
      assert(n >= 1L && n <= 24L)
      assert(span >= n, "observed hours cannot exceed the span containing them")
      assert(r.getAs[Long]("avail_e4") == 10000L * n / 24L)
    }
    val expect = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
      .distinct().count()
    assert(a.count() == expect, "one row per active (sensor, day)")
  }

  test("stream_escalation: live runs equal the batch escalation board exactly") {
    val streamed = run("stream_escalation")
    val batch = run("signal_escalation")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "live escalation runs diverge from the batch board")
  }
}
