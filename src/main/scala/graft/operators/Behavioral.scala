package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables
import graft.sources.Tables.epochS

/** Behavioral / product analytics over the event log — the read-side
  * questions an event-sourced system answers (conversion, retention,
  * funnels). All single-shuffle window/agg constructions.
  */
object Behavioral extends OpFamily {

  // B1: forward as-of — each signup's FIRST purchase at-or-after it
  // (conversion + lag). Same union-window trick as the backward as-of
  // (R11) but ordered descending; no range explosion.
  private def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), epochS(col("ts")).as("ts_s"))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val pEid = when(col("event_type") === "purchase", col("event_id"))
    val pTs = when(col("event_type") === "purchase", col("ts_s"))
    ev.withColumn("p_eid", last(pEid, ignoreNulls = true).over(w))
      .withColumn("p_ts_s", last(pTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"),
        col("p_eid").as("purchase_eid"),
        (col("p_ts_s") - col("ts_s")).as("lag_s"))
  }

  private val asofForwardSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |  FROM events WHERE event_type IN ('purchase', 'signup')),
      |wd AS (
      |  SELECT event_id, user_id, event_type, ts_s,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_eid,
      |    last_value(CASE WHEN event_type = 'purchase' THEN ts_s END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_ts_s
      |  FROM ev)
      |SELECT event_id, user_id, p_eid AS purchase_eid, p_ts_s - ts_s AS lag_s
      |FROM wd WHERE event_type = 'signup'""".stripMargin

  // B2: weekly retention cohorts — users grouped by first-activity
  // week, counted in each week they return. Two hash-aggs, exact.
  private val epoch0 = 1704067200L // 2024-01-01, week origin

  private def retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        expr(s"(cast(floor(unix_timestamp(ts)) as bigint) - $epoch0) div 604800").as("wk"))
    val weeks = ev.distinct()
    val cohort = weeks.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    weeks.join(cohort, "user_id")
      .groupBy("cohort_wk", "wk")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private val retentionSql =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id,
       |    (CAST(floor(epoch(ts)) AS BIGINT) - $epoch0) // 604800 AS wk
       |  FROM events),
       |cohort AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort_wk FROM weeks GROUP BY 1)
       |SELECT c.cohort_wk, w.wk, count(DISTINCT w.user_id) AS n_users
       |FROM weeks w JOIN cohort c ON w.user_id = c.user_id
       |GROUP BY 1, 2""".stripMargin

  // B3: funnel detection — did (user, hour) produce view → click →
  // purchase in order? Staged running-flag windows: an event's frame
  // sees whether a view happened strictly before it, a click qualifies
  // only after a view, a purchase only after a qualified click. Every
  // row carries O(1) state — no collected per-key sequence array, so a
  // hot key at 100× volume cannot inflate a single reducer row (the
  // sorted-collect formulation materializes the whole (user,hour)
  // sequence on one row). The oracle still builds the ordered string
  // and regex-matches it — same semantics, exhaustively cross-checked.
  private def funnel(s: SparkSession, d: String): DataFrame = {
    val prev = Window.partitionBy("user_id", "bucket_s")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"),
        expr("(cast(floor(unix_timestamp(ts)) as bigint) div 3600) * 3600").as("bucket_s"),
        col("ts"), col("event_id"), col("event_type"))
      .withColumn("sv",
        coalesce(max(when(col("event_type") === "view", 1).otherwise(0)).over(prev), lit(0)))
      .withColumn("ck",
        when(col("event_type") === "click" && col("sv") === 1, 1).otherwise(0))
      .withColumn("sck", coalesce(max(col("ck")).over(prev), lit(0)))
      .withColumn("pp",
        when(col("event_type") === "purchase" && col("sck") === 1, 1).otherwise(0))
      .groupBy("user_id", "bucket_s")
      .agg(count(lit(1)).as("n"), (max(col("pp")) === 1).as("has_funnel"))
  }

  private val funnelSql =
    """SELECT user_id,
      |  (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |  count(*) AS n,
      |  regexp_matches(string_agg(event_type, '>' ORDER BY ts, event_id), 'view.*click.*purchase') AS has_funnel
      |FROM events GROUP BY 1, 2""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("asof_forward", asofForward, Some(asofForwardSql)),
    Op("retention", retention, Some(retentionSql)),
    Op("funnel_detect", funnel, Some(funnelSql)))
}
