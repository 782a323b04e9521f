package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semantics checks for the event-sourcing core against independent
  * in-memory recomputation of the fold. */
class EventSourcingSpec extends SparkSpec {

  private lazy val raw = Tables.events(spark, sf)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private def cents(v: Double): Long = math.round(v * 100)

  private def delta(t: String, v: Double): Long = t match {
    case "purchase" => cents(v)
    case "error"    => -cents(v)
    case "signup"   => 1000L
    case _          => 0L
  }

  test("es_state_fold balance matches independent fold") {
    val expected = raw.groupBy(_._3).view.mapValues(evs =>
      evs.map(e => delta(e._4, e._5)).sum).toMap
    val got = run("es_state_fold").select("user_id", "balance_c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("es_latest_state picks the max-(ts,event_id) event") {
    val expected = raw.groupBy(_._3).view.mapValues(evs =>
      evs.maxBy(e => (e._2.getTime, e._1))._4).toMap
    val got = run("es_latest_state").select("user_id", "last_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
  }

  test("es_command_apply accepts iff snapshot balance covers cost") {
    val rows = run("es_command_apply").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ok = r.getAs[Long]("balance_c") >= r.getAs[Long]("cost_c")
      assert(r.getAs[String]("decision") == (if (ok) "accept" else "reject"))
    }
  }

  test("es_sequence is dense per aggregate starting at 1") {
    val bad = run("es_sequence").groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("seq_no").as("lo"), max("seq_no").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("es_replay_asof never counts more events than the full fold") {
    val full = run("es_state_fold").select("user_id", "n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("es_replay_asof").select("user_id", "n_events").collect().foreach { r =>
      assert(r.getLong(1) <= full(r.getLong(0)))
    }
  }
}
