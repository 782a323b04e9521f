package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables
import graft.sources.Tables.cents

/** Event-time windowing + threshold signals.
  *
  * Reference: surge's health-signal windowing
  * (`modules/common/src/main/scala/surge/health/windows/Window.scala`
  * and `surge/internal/health/windows` — sliding/tumbling windows over
  * a signal stream) and its frequency pattern matchers
  * (`surge/health/config/SignalPatternMatcherConfig.scala`) that fire a
  * signal when an event repeats ≥ k times inside a window.
  *
  * Spark-first: built-in `window()` / `session_window()` grouping —
  * codegen'd, partial-agg, watermark-compatible (the streaming twins
  * live in [[graft.streaming.Streams]]). Window starts are emitted as
  * epoch seconds (engine-neutral, exact).
  */
object Windows extends OpFamily {

  // W1: tumbling 1h windows per event type.
  private def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(unix_timestamp(col("w.start")).as("bucket_s"), col("event_type"),
        col("n"), col("sum_c"))

  private val tumblingSql =
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_c
      |FROM events GROUP BY 1, 2""".stripMargin

  // W2: sliding 2h windows advancing 1h (each event lands in 2 windows).
  private def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(unix_timestamp(col("w.start")).as("bucket_s"), col("event_type"),
        col("n"), col("sum_c"))

  private val slidingSql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value*100,0) AS BIGINT) AS c,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS h
      |  FROM events),
      |x AS (SELECT event_type, c, unnest([h - 3600, h]) AS bucket_s FROM e)
      |SELECT bucket_s, event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_c
      |FROM x GROUP BY 1, 2""".stripMargin

  // W3: session windows, 30-minute inactivity gap, per aggregate.
  // Spark-native `session_window`; the oracle rebuilds sessions with the
  // classic gaps-and-islands break/cumsum construction.
  private def session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("sess_n"), sum(cents(col("value"))).as("sum_c"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start_s"),
        col("sess_n"), col("sum_c"))

  private[graft] val sessionSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, CAST(round(value*100,0) AS BIGINT) AS c
      |  FROM events),
      |f AS (
      |  SELECT user_id, us, c,
      |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |g AS (
      |  SELECT user_id, us, c,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f)
      |SELECT user_id, CAST(min(us) // 1000000 AS BIGINT) AS sess_start_s,
      |  count(*) AS sess_n, CAST(sum(c) AS BIGINT) AS sum_c
      |FROM g GROUP BY user_id, sid""".stripMargin

  // W4: frequency signal — ≥2 error events from one aggregate inside a
  // 1h window fires a signal row (surge SignalPatternMatcher).
  private def signalThreshold(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "error")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("user_id"), unix_timestamp(col("w.start")).as("bucket_s"), col("n"))

  private val signalSql =
    """SELECT user_id, (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |  count(*) AS n
      |FROM events WHERE event_type = 'error'
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  // W9: the reference's full matcher kit — surge ships THREE signal
  // pattern matcher kinds
  // (`modules/common/src/main/scala/surge/health/matchers/SignalPatternMatcherDefinition.scala:22-24`):
  // `nameEquals(name)`, regex `pattern(regex)`, `repeating(times)`; a
  // fired matcher emits a Signal (the `SideEffect` emission,
  // `SignalPatternMatcher.scala`). One windowed hash-agg computes all
  // three matchers' counts; the matcher dimension unpivots via
  // explode(array(struct…)) — no per-matcher rescan of the log.
  /** Per-(window, aggregate) matcher counts — streaming-compatible
    * (the same window agg runs under a watermark; see the streaming
    * spec). Input needs (ts, user_id, event_type). */
  private[graft] def matcherCounts(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_name"),
        sum(when(col("event_type").rlike("^si"), 1L).otherwise(0L)).as("n_regex"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_rep"))
      .select(unix_timestamp(col("w.start")).as("bucket_s"), col("user_id"),
        col("n_name"), col("n_regex"), col("n_rep"))

  /** Unpivot the matcher counts into fired signal rows with the
    * side-effect emission column. */
  private[graft] def matcherSignals(base: DataFrame): DataFrame =
    base.select(col("bucket_s"), col("user_id"), explode(array(
        struct(lit("nameEquals:error").as("matcher"), col("n_name").as("n"),
          (col("n_name") >= 1).as("fired")),
        struct(lit("pattern:^si").as("matcher"), col("n_regex").as("n"),
          (col("n_regex") >= 1).as("fired")),
        struct(lit("repeating:3:click").as("matcher"), col("n_rep").as("n"),
          (col("n_rep") >= 3).as("fired")))).as("m"))
      .filter(col("m.fired"))
      .select(col("bucket_s"), col("user_id"),
        col("m.matcher").as("matcher"), col("m.n").as("n"),
        concat(lit("signal:"), col("m.matcher"), lit("@"),
          col("bucket_s").cast("string")).as("side_effect"))

  private def signalPattern(s: SparkSession, d: String): DataFrame =
    matcherSignals(matcherCounts(Tables.events(s, d)))

  /** CTE bundle ending in `sig` = the fired-signal rows; shared by the
    * W9 oracle and the W11 supervision oracle. */
  private val signalCtes =
    """b AS (
      |  SELECT user_id, (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_name,
      |    CAST(sum(CASE WHEN regexp_matches(event_type, '^si') THEN 1 ELSE 0 END) AS BIGINT) AS n_regex,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_rep
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT bucket_s, user_id, 'nameEquals:error' AS matcher, n_name AS n, n_name >= 1 AS fired FROM b
      |  UNION ALL
      |  SELECT bucket_s, user_id, 'pattern:^si', n_regex, n_regex >= 1 FROM b
      |  UNION ALL
      |  SELECT bucket_s, user_id, 'repeating:3:click', n_rep, n_rep >= 3 FROM b),
      |sig AS (
      |  SELECT bucket_s, user_id, matcher, n,
      |    'signal:' || matcher || '@' || CAST(bucket_s AS VARCHAR) AS side_effect
      |  FROM u WHERE fired)""".stripMargin

  private[graft] val signalPatternSql =
    s"""WITH $signalCtes
       |SELECT bucket_s, user_id, matcher, n, side_effect FROM sig""".stripMargin

  // W11 `signal_supervision`: the health-SUPERVISOR decision loop —
  // surge components register restart and shutdown signal PATTERNS
  // (`modules/common/src/main/scala/surge/health/supervisor/Domain.scala`:
  // `SupervisedComponentRegistration(componentName, _,
  // restartSignalPatterns, shutdownSignalPatterns)`) and the supervisor
  // matches every fired health signal against them, issuing
  // RestartComponent / ShutdownComponent control messages
  // (`supervisor/Api.scala`). The query re-expression: fired signals
  // (W9) × the registration table, action = first matching pattern
  // class with SHUTDOWN taking precedence — the control-decision log an
  // operator audits. The registration table is tiny at any scale, so
  // the non-equi regex join is a BROADCAST nested-loop over one signal
  // pass — the intended plan (PlanLint allowlists it); patterns stay in
  // the Java-regex ∩ RE2 anchored subset.
  /** The supervisor's registration table + decision join, shared by the
    * batch W11 and its streaming twin ([[graft.streaming.Streams]]):
    * fired signals × registrations, SHUTDOWN precedence. */
  private[graft] def superviseDecisions(signals: DataFrame): DataFrame = {
    val regs = signals.sparkSession.sql(
      """SELECT * FROM VALUES
        |  ('kafka-consumer', '^nameEquals:', '^repeating:'),
        |  ('state-store',    '^pattern:',    NULL),
        |  ('shard-router',   '^repeating:',  '^nameEquals:error$')
        |  AS t(component, restart_re, shutdown_re)""".stripMargin)
    signals.crossJoin(broadcast(regs))
      .withColumn("action",
        when(col("shutdown_re").isNotNull && expr("matcher RLIKE shutdown_re"),
          "shutdown")
          .when(expr("matcher RLIKE restart_re"), "restart"))
      .filter(col("action").isNotNull)
      .select("component", "action", "matcher", "bucket_s", "user_id")
  }

  private def signalSupervision(s: SparkSession, d: String): DataFrame =
    superviseDecisions(matcherSignals(matcherCounts(Tables.events(s, d))))

  private[graft] val signalSupervisionSql =
    s"""WITH $signalCtes,
       |regs AS (
       |  SELECT * FROM (VALUES
       |    ('kafka-consumer', '^nameEquals:', '^repeating:'),
       |    ('state-store',    '^pattern:',    NULL),
       |    ('shard-router',   '^repeating:',  '^nameEquals:error$$'))
       |    t(component, restart_re, shutdown_re))
       |SELECT r.component,
       |  CASE WHEN r.shutdown_re IS NOT NULL AND regexp_matches(s.matcher, r.shutdown_re)
       |       THEN 'shutdown'
       |       WHEN regexp_matches(s.matcher, r.restart_re) THEN 'restart' END AS action,
       |  s.matcher, s.bucket_s, s.user_id
       |FROM sig s CROSS JOIN regs r
       |WHERE (r.shutdown_re IS NOT NULL AND regexp_matches(s.matcher, r.shutdown_re))
       |   OR regexp_matches(s.matcher, r.restart_re)""".stripMargin

  // W13 `signal_throttle`: the signal-stream THROTTLE — surge's
  // windowing health stream caps emissions at `ThrottleConfig(
  // elements, duration)` (`modules/common/src/main/scala/surge/health/
  // config/WindowingStreamConfig.scala:25,76`): at most N signals per
  // window reach the bus; the rest are shed. Re-expressed: keep the
  // first `throttleN` fired signals per hourly bucket under a
  // deterministic priority (user_id, then matcher class — the order
  // is part of the contract so both engines agree), shed the rest.
  // Planned SORT-FREE by the custom TopKPerKey physical operator
  // (bounded heap per bucket), not a row_number window — per-bucket
  // signal volume is unbounded at 100 TB and the throttle is exactly
  // the operator that must not buffer it.
  private val throttleN = 10

  private def signalThrottle(s: SparkSession, d: String): DataFrame = {
    val prio = expr(
      """user_id * 4 + CASE matcher WHEN 'nameEquals:error' THEN 0
        |  WHEN 'pattern:^si' THEN 1 ELSE 2 END""".stripMargin)
    val sig = matcherSignals(matcherCounts(Tables.events(s, d)))
      .withColumn("prio", prio)
      .withColumn("neg", -col("prio"))
    graft.plans.TopK.topKPerKey(sig, throttleN, "bucket_s", "neg", "prio")
      .select("bucket_s", "user_id", "matcher", "n")
  }

  private val signalThrottleSql =
    s"""WITH $signalCtes,
       |p AS (
       |  SELECT bucket_s, user_id, matcher, n,
       |    user_id * 4 + CASE matcher WHEN 'nameEquals:error' THEN 0
       |      WHEN 'pattern:^si' THEN 1 ELSE 2 END AS prio
       |  FROM sig),
       |r AS (SELECT *, row_number() OVER (PARTITION BY bucket_s ORDER BY prio) AS rn FROM p)
       |SELECT bucket_s, user_id, matcher, n FROM r WHERE rn <= $throttleN""".stripMargin

  // W15 `signal_debounce`: the alert-fatigue gate every paging system
  // runs in front of humans — after a signal FIRES for a key, suppress
  // that key's signals for a cooldown; the next fire re-arms the
  // window. This is greedy and stateful (whether a signal emits
  // depends on which earlier signals emitted), so unlike the throttle
  // (W13: top-N per fixed window) it is NOT window-expressible — it is
  // surge's per-aggregate sequential semantics (the A2 mailbox walk)
  // applied to the signal stream. O(1) state per key; the per-key sort
  // is bounded by the aggregate's own history, the same contract every
  // per-actor fold in the reference has. The oracle replays the
  // identical walk as a recursive CTE over row-numbered signals.
  private val debounceCoolUs = 3600000000L // 1 h cooldown, exact µs

  private def signalDebounce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cool = debounceCoolUs
    Tables.events(s, d).filter(col("event_type") === "error")
      .select(col("user_id"), Tables.microsOf(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long)]) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        val out = Seq.newBuilder[(Long, Long, Long)]
        var last = Long.MinValue
        for ((_, us, eid) <- evs)
          if (last == Long.MinValue || us >= last + cool) {
            out += ((uid, eid, us)); last = us
          }
        out.result().iterator
      }
      .toDF("user_id", "event_id", "ts_us")
  }

  private val signalDebounceSql =
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events WHERE event_type = 'error'),
       |walk AS (
       |  SELECT user_id, event_id, us, rn, TRUE AS emitted, us AS last_us
       |  FROM e WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.event_id, e.us, e.rn,
       |    e.us >= w.last_us + $debounceCoolUs AS emitted,
       |    CASE WHEN e.us >= w.last_us + $debounceCoolUs THEN e.us ELSE w.last_us END
       |  FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
       |SELECT user_id, event_id, CAST(us AS BIGINT) AS ts_us
       |FROM walk WHERE emitted""".stripMargin

  // W16 `signal_flap`: the flapping detector — a component bouncing
  // between error and healthy states is a DIFFERENT pathology than one
  // that is simply down, and paging on every bounce is how alert
  // fatigue starts (the anti-flap rule every supervisor ships:
  // Alertmanager's group_interval, Nagios's flap detection; surge's
  // health supervisor faces the same stream). Per (aggregate, hour):
  // state transitions counted via one lag() window (partition keys =
  // the single shuffle's keys), flapping when ≥ 4 transitions. Exact
  // integers; one window + one hash-agg.
  private def signalFlap(s: SparkSession, d: String): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "bucket_s").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("(cast(floor(unix_timestamp(ts)) as bigint) div 3600) * 3600").as("bucket_s"),
        (col("event_type") === "error").cast("int").as("is_err"))
      .withColumn("chg",
        when(lag(col("is_err"), 1).over(ord).isNotNull &&
          lag(col("is_err"), 1).over(ord) =!= col("is_err"), 1L).otherwise(0L))
      .groupBy("user_id", "bucket_s")
      .agg(count(lit(1)).as("n"), sum(col("chg")).as("n_transitions"))
      .withColumn("flapping", col("n_transitions") >= 4L)
  }

  private val signalFlapSql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      |  FROM events),
      |f AS (
      |  SELECT user_id, bucket_s, is_err,
      |    lag(is_err) OVER (PARTITION BY user_id, bucket_s ORDER BY ts, event_id) AS prev
      |  FROM e)
      |SELECT user_id, bucket_s, count(*) AS n,
      |  CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> is_err THEN 1 ELSE 0 END) AS BIGINT) AS n_transitions,
      |  CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> is_err THEN 1 ELSE 0 END) AS BIGINT) >= 4 AS flapping
      |FROM f GROUP BY 1, 2""".stripMargin

  // W17 `signal_gaps`: the SILENCE detector — the dual of W16's
  // flapping. A healthy aggregate emits continuously; the longest gap
  // between consecutive events per aggregate (and how often it exceeds
  // the heartbeat SLA) is exactly what surge's health checks watch for
  // (`modules/common/src/main/scala/surge/internal/health/HealthSignalStreamProvider.scala`
  // — a stream that stops signaling IS the failure), and downstream it
  // is the second input (beside E23's lateness) to watermark and
  // passivation-timeout sizing. Plan: one per-key lag() window (the
  // partition key is the single shuffle's key) feeding one hash-agg;
  // the gap multiset depends only on each key's sorted event times, so
  // same-µs ties cannot perturb the answer. Exact µs integers.
  private[graft] val gapSlaUs = 3600000000L // 1 h heartbeat SLA, exact µs

  private def signalGaps(s: SparkSession, d: String): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), Tables.microsOf(col("ts")).as("us"), col("event_id"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(ord))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_us"),
        sum(when(col("gap") >= gapSlaUs, 1L).otherwise(0L)).as("n_sla_gaps"))
  }

  private[graft] val signalGapsSql =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events)
       |SELECT user_id, count(*) AS n_events,
       |  COALESCE(CAST(max(us - prev) AS BIGINT), 0) AS max_gap_us,
       |  CAST(sum(CASE WHEN us - prev >= $gapSlaUs THEN 1 ELSE 0 END) AS BIGINT) AS n_sla_gaps
       |FROM e GROUP BY 1""".stripMargin

  // W19 `signal_correlation`: which signal types FIRE TOGETHER — per
  // type pair, the number of (aggregate, hour) cells where both
  // occurred, with each type's own cell count and the exact Jaccard
  // co-occurrence. This is the alert-correlation table an operator
  // reads to collapse cascading pages into one incident (the
  // supervisor's registration patterns in W11 are hand-written; this
  // MEASURES which signals actually travel together). The self-join
  // is keyed on (aggregate, hour) where each block holds at most
  // |types| rows — bounded at any corpus size — and the output grid
  // is ≤|types|²; both closing aggs are tiny. One distinct pass over
  // the log, no sort anywhere.
  private def signalCorrelation(s: SparkSession, d: String): DataFrame = {
    val u = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 3600").as("hr"), col("event_type"))
      .distinct()
      .cache()
    val tot = u.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = u.alias("a")
      .join(u.alias("b"),
        col("a.user_id") === col("b.user_id") && col("a.hr") === col("b.hr") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_cooccur"))
    pairs
      .join(broadcast(tot.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(tot.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_cooccur"), col("n_a"), col("n_b"),
        expr("(10000 * n_cooccur) div (n_a + n_b - n_cooccur)").as("jaccard_e4"))
  }

  private val signalCorrelationSql =
    """WITH u AS (
      |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
      |    event_type
      |  FROM events),
      |t AS (SELECT event_type, count(*) AS n FROM u GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_cooccur
      |  FROM u a JOIN u b
      |    ON a.user_id = b.user_id AND a.hr = b.hr AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_cooccur, ta.n AS n_a, tb.n AS n_b,
      |  CAST((10000 * n_cooccur) // (ta.n + tb.n - n_cooccur) AS BIGINT) AS jaccard_e4
      |FROM p JOIN t ta ON ta.event_type = type_a
      |       JOIN t tb ON tb.event_type = type_b""".stripMargin

  // W21 `signal_escalation`: the PERSISTENCE-based escalation policy —
  // a signal that keeps firing hour after hour is an incident, not an
  // alert (page it); an isolated fire is a ticket. Per aggregate:
  // hours with ≥1 error collapse to consecutive RUNS (gaps-and-islands
  // on the hour index — the W3 construction on a bounded per-user
  // hour grid instead of raw events), each run emitted with its
  // length and the run_hours ≥ 3 escalation verdict. Every window
  // partitions on user_id (the single shuffle's key) over the tiny
  // fired-hour grid, never the log; the log itself collapses to that
  // grid in ONE hash-agg.
  /** The fired-hour grid: per (aggregate, hour), error count. The agg
    * body is reused verbatim by the streaming twin (complete mode). */
  private[graft] def firedGrid(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"),
        expr("unix_timestamp(ts) div 3600").as("hr"))
      .agg(count(lit(1)).as("n_errors"))

  /** Consecutive-run resolution over any fired grid — tiny by
    * construction, every window partitioned on the key. */
  private[graft] def escalationRuns(fired: DataFrame): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
    fired
      .withColumn("grp", col("hr") - row_number().over(ord))
      .groupBy("user_id", "grp")
      .agg(min(col("hr")).as("start_hr"), count(lit(1)).as("run_hours"),
        sum(col("n_errors")).as("n_errors"))
      .select(col("user_id"), (col("start_hr") * 3600).as("start_s"),
        col("run_hours"), col("n_errors"),
        (col("run_hours") >= 3).as("escalated"))
  }

  private def signalEscalation(s: SparkSession, d: String): DataFrame =
    escalationRuns(firedGrid(Tables.events(s, d)))

  private[graft] val signalEscalationSql =
    """WITH f AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
      |    count(*) AS n_errors
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      |g AS (
      |  SELECT *, hr - row_number() OVER (PARTITION BY user_id ORDER BY hr) AS grp
      |  FROM f)
      |SELECT user_id, CAST(min(hr) * 3600 AS BIGINT) AS start_s,
      |  count(*) AS run_hours,
      |  CAST(sum(n_errors) AS BIGINT) AS n_errors,
      |  count(*) >= 3 AS escalated
      |FROM g GROUP BY user_id, grp""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("signal_escalation", signalEscalation, Some(signalEscalationSql)),
    Op("signal_correlation", signalCorrelation, Some(signalCorrelationSql)),
    Op("signal_gaps", signalGaps, Some(signalGapsSql)),
    Op("signal_flap", signalFlap, Some(signalFlapSql)),
    Op("signal_debounce", signalDebounce, Some(signalDebounceSql)),
    Op("signal_throttle", signalThrottle, Some(signalThrottleSql)),
    Op("win_tumbling", tumbling, Some(tumblingSql)),
    Op("win_sliding", sliding, Some(slidingSql)),
    Op("win_session", session, Some(sessionSql)),
    Op("signal_threshold", signalThreshold, Some(signalSql)),
    Op("signal_pattern", signalPattern, Some(signalPatternSql)),
    Op("signal_supervision", signalSupervision, Some(signalSupervisionSql)))
}
