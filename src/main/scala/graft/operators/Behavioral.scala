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

  // B4: first-touch session attribution — every purchase's revenue
  // credited to the SESSION it happened in and that session's ENTRY
  // event (the channel that opened it). Sessionization is W3's
  // 30-minute-gap gaps-and-islands (lag + running sum share one sort
  // within the user partition — a single exchange), then ONE hash-agg
  // per session. The entry event is an argmin by (ts, event_id) —
  // packed-decimal min ([[Packed]]), NOT min_by(struct, …) which
  // silently plans SortAggregate and re-sorts every user's history a
  // second time. Payload = a small event-type code decoded after the
  // agg. Exact integers throughout (µs, cents).
  private val typeCodes =
    Seq("view" -> 1, "click" -> 2, "purchase" -> 3, "signup" -> 4, "error" -> 5)

  private def sessionAttribution(s: SparkSession, d: String): DataFrame = {
    val code = typeCodes.foldLeft(lit(0)) { case (acc, (t, c)) =>
      when(col("event_type") === t, c).otherwise(acc)
    }
    val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        Tables.microsOf(col("ts")).as("us"), Tables.cents(col("value")).as("c"))
    val sess = ev
      .withColumn("brk",
        when(lag(col("us"), 1).over(ord).isNull ||
          col("us") - lag(col("us"), 1).over(ord) >= 1800000000L, 1).otherwise(0))
      .withColumn("sid",
        sum(col("brk")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    val entry = min(Packed.latest(col("ts"), col("event_id"), code)).as("entry_pk")
    val decoded = typeCodes.foldLeft(lit(null).cast("string")) { case (acc, (t, c)) =>
      when(Packed.payload(col("entry_pk")) === c, t).otherwise(acc)
    }
    sess.groupBy("user_id", "sid")
      .agg(
        expr("min(us) div 1000000").as("sess_start_s"),
        entry,
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("revenue_c"),
        (max(when(col("event_type") === "purchase", 1).otherwise(0)) === 1).as("converted"))
      .select(col("user_id"), col("sess_start_s"), decoded.as("entry_type"),
        col("n"), col("revenue_c"), col("converted"))
  }

  private val sessionAttributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CAST(round(value*100,0) AS BIGINT) AS c
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 1800000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |g AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f),
      |h AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
      |  FROM g)
      |SELECT user_id, CAST(min(us) // 1000000 AS BIGINT) AS sess_start_s,
      |  max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS revenue_c,
      |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS converted
      |FROM h GROUP BY user_id, sid""".stripMargin

  // B5: the next-event transition matrix — P(next event | this event)
  // per user stream, the first-order Markov view product analytics
  // builds "what do users do next" and anomaly baselines from. One
  // lead() window (per-user sort, the partition key is the shuffle
  // key) feeding ONE hash-agg over the ≤|types|² transition grid;
  // share_e4 is an exact integer cross-multiply attached by a window
  // over that tiny grid, never the corpus. Ordering ties break on
  // event_id (same-second ties are real from sf0.1 up).
  private def transitions(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(ord))
      .filter(col("to_type").isNotNull)
    steps.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(10000 * n) div from_total").as("share_e4"))
  }

  private val transitionsSql =
    """WITH e AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST((10000 * n) // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS BIGINT) AS share_e4
      |FROM c""".stripMargin

  // B6 `behavior_cohort`: the COHORT MATRIX — users grouped by
  // first-seen day, activity counted per (cohort, age-in-days). B2's
  // retention gives one diagonal of this table; the full matrix is
  // what product analytics actually charts (each cohort's decay
  // curve). Plan at 100 TB: per-user first-day is one hash-agg keyed
  // by user; the join back is keyed by user TOO, so with the
  // aggregated side shuffle-hash-hinted the fact side reuses its own
  // shuffle (the E19/R17 shape) and no sort appears; the final
  // distinct-users-per-cell agg shuffles the (cohort, day) pairs —
  // bounded by |users|·|active days|, never event volume.
  private def cohort(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr(s"${epochSql} div 86400").as("day"))
    val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_d"))
    ev.join(first.hint("shuffle_hash"), Seq("user_id"))
      .groupBy(col("cohort_d"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("cohort_d"), (col("day") - col("cohort_d")).as("age_d"),
        col("n_users"))
  }

  // epoch-day bucketing shared by the Spark and oracle sides: exact
  // integer floor of epoch seconds (UTC session on both engines)
  private val epochSql = "unix_timestamp(ts)"

  private val cohortSql =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_d FROM e GROUP BY 1)
      |SELECT f.cohort_d, e.day - f.cohort_d AS age_d,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin

  // B7 `behavior_pathing`: the 3-step PATH matrix — B5's transition
  // view extended one hop: which (step1 → step2 → step3) sequences do
  // user streams actually walk, and how many distinct users walk each.
  // The length-3 window is where pathing analyses start (2 steps can't
  // separate "view→click→purchase" from "view→click→view" loops).
  // Both lead() columns ride ONE window spec (one shuffle on user_id,
  // one per-user sort bounded by the user's own history — the same
  // per-aggregate contract as B5); the path grid is ≤|types|³ rows, so
  // the closing hash-agg with its distinct-user count is corpus-size
  // independent.
  private def pathing(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("step2", lead(col("event_type"), 1).over(ord))
      .withColumn("step3", lead(col("event_type"), 2).over(ord))
      .filter(col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private[graft] val pathingSql =
    """WITH t AS (
      |  SELECT user_id, event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT step1, step2, step3, count(*) AS n_paths,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM t WHERE step3 IS NOT NULL GROUP BY 1, 2, 3""".stripMargin

  // B8 `behavior_anomaly`: per-USER burst detection — which of a
  // user's active days carry event volume more than 3σ above their
  // OWN baseline (account compromise, scraping, and runaway clients
  // surface as exactly this; M13's 3-sigma flags sensor READINGS
  // against the fleet, this flags days against the aggregate's own
  // history). The corpus collapses to the (user, day) activity grid
  // in one hash-agg; the per-user moments are a second agg over that
  // grid joined back on the user key (the grid reuses its own
  // shuffle, shuffle_hash on the aggregated side); the verdict is
  // M13's integer cross-multiply — (n·D − S)² > 9·(D·Q − S²) — run in
  // decimal(38,0) (the Packed precedent; DuckDB side HUGEINT), since
  // the S²/D·Q terms overflow int64 once a user's total reaches ~3e9
  // and Spark would wrap silently while DuckDB raises (r7 advisor
  // item; exact up to per-user totals ~1e18). No FP, no sort, nothing
  // corpus-scale after the first agg. Baseline = ACTIVE days only
  // (zero-days are absent rows by construction; documented contract).
  /** The burst verdict over any (user_id, day, n) activity grid —
    * separated so specs can drive it with synthetic bursts of known
    * arithmetic (the real corpus has none at spec scale). */
  private[graft] def anomalyDays(grid: DataFrame): DataFrame = {
    val mom = grid.groupBy("user_id")
      .agg(count(lit(1)).as("dd"), sum(col("n")).as("ss"),
        sum(col("n") * col("n")).as("qq"))
    val Seq(nD, ddD, ssD, qqD) = Seq("n", "dd", "ss", "qq")
      .map(c => col(c).cast("decimal(19,0)"))
    grid.join(mom.hint("shuffle_hash"), Seq("user_id"))
      .filter((nD * ddD - ssD) * (nD * ddD - ssD)
        > lit(9L).cast("decimal(19,0)") * (ddD * qqD - ssD * ssD))
      .filter(nD * ddD > ssD)
      .select(col("user_id"), col("day"), col("n").as("n_events"),
        col("dd").as("n_active_days"), col("ss").as("total_events"))
  }

  private def behaviorAnomaly(s: SparkSession, d: String): DataFrame =
    anomalyDays(Tables.events(s, d)
      .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n")))

  private val behaviorAnomalySql =
    """WITH g AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, count(*) AS dd, CAST(sum(n) AS BIGINT) AS ss,
      |    CAST(sum(n * n) AS BIGINT) AS qq
      |  FROM g GROUP BY 1)
      |SELECT g.user_id, g.day, g.n AS n_events,
      |  m.dd AS n_active_days, m.ss AS total_events
      |FROM g JOIN m USING (user_id)
      |WHERE (CAST(g.n AS HUGEINT) * m.dd - m.ss) * (CAST(g.n AS HUGEINT) * m.dd - m.ss)
      |        > 9 * (CAST(m.dd AS HUGEINT) * m.qq - CAST(m.ss AS HUGEINT) * m.ss)
      |  AND CAST(g.n AS HUGEINT) * m.dd > m.ss""".stripMargin

  // B10 `behavior_conversion_lag`: the signup→purchase latency
  // DISTRIBUTION — B1 computes each signup's forward as-of lag; this
  // rolls those lags into power-of-2 buckets (T12's floor-log2 trick,
  // pure int64 in both engines) plus a −1 bucket for signups that
  // never convert. The funnel-latency histogram growth reviews read
  // ("how long does conversion take, and how much never converts") —
  // the distribution, where B1 gives the per-signup rows. One
  // per-user window pass (B1's) + one hash-agg to a ≤~40-row grid.
  private def conversionLag(s: SparkSession, d: String): DataFrame =
    asofForward(s, d)
      .withColumn("bucket",
        when(col("purchase_eid").isNull, lit(-1L))
          .otherwise(expr("cast(length(bin(lag_s + 1)) - 1 as bigint)")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_signups"),
        min(col("lag_s")).as("min_lag_s"), max(col("lag_s")).as("max_lag_s"))

  private val conversionLagSql =
    s"""WITH af AS ($asofForwardSql)
       |SELECT CASE WHEN purchase_eid IS NULL THEN -1
       |       ELSE CAST(length(bin(lag_s + 1)) - 1 AS BIGINT) END AS bucket,
       |  count(*) AS n_signups,
       |  CAST(min(lag_s) AS BIGINT) AS min_lag_s,
       |  CAST(max(lag_s) AS BIGINT) AS max_lag_s
       |FROM af GROUP BY 1""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("behavior_conversion_lag", conversionLag, Some(conversionLagSql)),
    Op("behavior_anomaly", behaviorAnomaly, Some(behaviorAnomalySql)),
    Op("behavior_pathing", pathing, Some(pathingSql)),
    Op("asof_forward", asofForward, Some(asofForwardSql)),
    Op("retention", retention, Some(retentionSql)),
    Op("funnel_detect", funnel, Some(funnelSql)),
    Op("behavior_transitions", transitions, Some(transitionsSql)),
    Op("behavior_cohort", cohort, Some(cohortSql)),
    Op("session_attribution", sessionAttribution, Some(sessionAttributionSql)))
}
