package graft

import org.apache.spark.sql.functions._

/** Round-3 additions: the packed-decimal argmax on the KTable path
  * (es_latest_state / metric_stats / stream_latest must plan as
  * HashAggregate — the max_by(struct,…) form silently falls back to
  * SortAggregate and full-sorts the log). */
class Round3Spec extends SparkSpec {

  private def assertHashAggOnly(name: String): Unit = {
    val df = run(name)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"$name must not plan a SortAggregate:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"$name should aggregate via HashAggregate:\n$plan")
  }

  test("es_latest_state plans as HashAggregate (no sort on the KTable path)") {
    assertHashAggOnly("es_latest_state")
  }

  test("metric_stats plans as HashAggregate (no sort for MostRecentValue)") {
    assertHashAggOnly("metric_stats")
  }

  test("packed argmax picks the max_by(struct) winner, incl. same-second ties") {
    import spark.implicits._
    // two users; user 1 has a same-second tie where event_id must break
    // the tie exactly like ORDER BY ts DESC, event_id DESC
    val ev = Seq(
      (1L, "2024-01-01 00:00:01.000500", 10L, "click", 1.25),
      (1L, "2024-01-01 00:00:01.000400", 11L, "error", 2.50), // earlier µs, larger id
      (1L, "2024-01-01 00:00:00.999999", 9L, "view", 3.75),
      (2L, "2024-01-02 12:34:56.789012", 20L, "signup", 490.02),
      (2L, "2024-01-02 12:34:56.789011", 21L, "purchase", 0.01))
      .toDF("user_id", "s", "event_id", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = graft.streaming.Streams.latestStateAgg(ev)
    val want = ev.groupBy("user_id")
      .agg(max_by(struct(col("event_type").as("last_type"), col("value").as("last_value")),
        struct(col("ts"), col("event_id"))).as("l"))
      .select(col("user_id"), col("l.last_type"), col("l.last_value"))
    assert(got.select("user_id", "last_type", "last_value").except(want).count() == 0)
    assert(want.except(got.select("user_id", "last_type", "last_value")).count() == 0)
  }

  test("streaming commands: state carries across micro-batches (accept then reject)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.api.{AccountModel, GraftEngine, Keyed, Account}
    import graft.streaming.Ev
    def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

    val eng = new GraftEngine(AccountModel)
    // snapshot: user 1 holds 1000 cents (one signup)
    val snapshot = eng.replayState(Seq(Ev(1, ts(0), 1, "signup", 0.0)).toDS())
    val input = MemoryStream[Ev]
    val out = eng.streamingCommands(input.toDS(), snapshot)
      .map(o => (o.command.event_id, o.aggregateId, o.accepted))
      .toDF("event_id", "user_id", "accepted")
    val q = out.writeStream.format("memory").queryName("cmd_stream_test")
      .outputMode("update").start()
    // batch 1: 600-cent purchase — covered (1000 ≥ 600)
    input.addData(Ev(10, ts(1), 1, "purchase", 6.0))
    q.processAllAvailable()
    // batch 2: another 600 — must REJECT: batch 1 left only 400
    input.addData(Ev(11, ts(2), 1, "purchase", 6.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cmd_stream_test")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(10L -> true, 11L -> false),
      s"state must carry across batches, got $got")
  }
}
