package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 eighth wave (escalation runs,
  * Q4 EXISTS shape, the live idempotency gate). */
class Round8hSpec extends SparkSpec {

  test("signal_escalation: runs tile the fired hours and never overlap") {
    val runs = run("signal_escalation").cache()
    // total run mass = number of distinct fired (user, hour) cells
    val fired = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), expr("unix_timestamp(ts) div 3600").as("hr"))
      .distinct().count()
    assert(runs.agg(sum("run_hours")).collect()(0).getLong(0) == fired)
    runs.collect().foreach { r =>
      assert(r.getAs[Boolean]("escalated") == (r.getAs[Long]("run_hours") >= 3L))
      assert(r.getAs[Long]("n_errors") >= r.getAs[Long]("run_hours"),
        "each fired hour carries at least one error")
    }
    // runs of the same user never touch: start of one run is never
    // inside another (they would have merged)
    val overlaps = runs.alias("a").join(runs.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.start_s") < col("b.start_s") &&
          col("b.start_s") <= col("a.start_s") + (col("a.run_hours")) * 3600L)
      .count()
    assert(overlaps == 0L, "adjacent runs failed to merge")
  }

  test("q4_priority: per-priority counts equal a distinct-order recount") {
    val got = run("q4_priority").collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n_orders")).toMap
    val expect = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n")).toMap
    assert(got == expect, "semi-join counts differ from the join+distinct recount")
  }

  test("stream_command_dedup: live verdicts equal the batch gate exactly") {
    val streamed = run("stream_command_dedup")
    val batch = run("es_command_dedup")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "live idempotency verdicts diverge from the batch gate")
  }
}
