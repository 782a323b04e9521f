package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables
import graft.sources.Tables.cents

/** Streaming-metrics statistics as distributed aggregations.
  *
  * Reference: surge's metrics module —
  * `modules/metrics/src/main/scala/surge/metrics/statistics/{Count,Min,Max,MostRecentValue}.scala`,
  * `ExponentiallyWeightedMovingAverage.scala:14-28` (seed with first
  * observation, then `ewma = ewma*w + v*(1-w)`),
  * `Rate.scala` / `RateHistogram.scala` (per-second average over an
  * expiry window), `TimeBucketHistogram.scala`.
  *
  * The sensor key is `event_type`; readings are (`value`, `ts`).
  *
  * EWMA is evaluated in closed form over each key's last 20 readings
  * with weight w = 0.5: every term is value_cents · 2^-k, so scaling by
  * 2^19 makes all arithmetic exact int64 — bit-identical across engines
  * and summation orders (the reason w is dyadic).
  */
object MetricsOps extends OpFamily {

  // M1: Count / Min / Max / MostRecentValue / mean per sensor, one pass.
  // MostRecentValue is a packed-decimal `max` ([[Packed]]) — the
  // max_by(value, struct(ts,event_id)) form forces SortAggregate (a
  // struct aggregation buffer is not hash-aggregable); packing keeps
  // the whole statistic block a single HashAggregate.
  private def stats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        max(Packed.latest(col("ts"), col("event_id"), cents(col("value")))).as("pk"),
        sum(cents(col("value"))).as("sum_c"))
      .withColumn("last_v", Packed.payload(col("pk")).cast("double") / lit(100.0))
      .withColumn("avg_v",
        col("sum_c").cast("double") / col("n").cast("double") / lit(100.0))
      .drop("pk")

  private val statsSql =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
      |    CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_c
      |  FROM events GROUP BY 1),
      |l AS (
      |  SELECT event_type, value AS last_v FROM (
      |    SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) rn
      |    FROM events) WHERE rn = 1)
      |SELECT s.event_type, s.n, s.min_v, s.max_v, l.last_v, s.sum_c,
      |  CAST(s.sum_c AS DOUBLE)/CAST(s.n AS DOUBLE)/100.0 AS avg_v
      |FROM s JOIN l ON s.event_type = l.event_type""".stripMargin

  // M2: EWMA per aggregate over its last 20 readings, w = 0.5.
  // Surge semantics: oldest reading seeds the average (weight w^(n-1)),
  // each later reading i (1-based, oldest=1) contributes (1-w)·w^(n-i).
  private def ewma(s: SparkSession, d: String): DataFrame = {
    val wDesc = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val base = Tables.events(s, d)
      .select(col("user_id"), cents(col("value")).as("c"), col("ts"), col("event_id"))
      .withColumn("rd", row_number().over(wDesc))
      .filter(col("rd") <= 20)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
    // exponent of 0.5 for this term: rd (recency rank) except the oldest
    // term which gets n-1 (the seed); scaled by 2^19 ⇒ exact int64.
    val e = when(col("rd") === col("n"), col("n") - 1).otherwise(col("rd"))
    base
      .withColumn("term", (col("c") * pow(lit(2.0), lit(19) - e)).cast("long"))
      .groupBy("user_id")
      .agg(max(col("n")).cast("long").as("n_used"), sum(col("term")).as("ewma_scaled"))
      .withColumn("ewma", col("ewma_scaled").cast("double") / lit(524288.0) / lit(100.0))
  }

  private val ewmaSql =
    """WITH b AS (
      |  SELECT user_id, CAST(round(value*100,0) AS BIGINT) AS c,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM events),
      |f AS (SELECT * FROM b WHERE rd <= 20),
      |g AS (SELECT *, count(*) OVER (PARTITION BY user_id) AS n FROM f)
      |SELECT user_id, CAST(max(n) AS BIGINT) AS n_used,
      |  CAST(sum(CAST(c * pow(2.0, 19 - (CASE WHEN rd = n THEN n - 1 ELSE rd END)) AS BIGINT)) AS BIGINT) AS ewma_scaled,
      |  CAST(sum(CAST(c * pow(2.0, 19 - (CASE WHEN rd = n THEN n - 1 ELSE rd END)) AS BIGINT)) AS DOUBLE)/524288.0/100.0 AS ewma
      |FROM g GROUP BY user_id""".stripMargin

  // M3: per-second rate over 10-minute buckets (RateHistogram's
  // per-second-average-over-window, bucketed instead of expiring).
  private def rate(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), unix_timestamp(col("w.start")).as("bucket_s"), col("n"),
        (col("n").cast("double") / lit(600.0)).as("rate_per_s"))

  private val rateSql =
    """SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS bucket_s,
      |  count(*) AS n, CAST(count(*) AS DOUBLE)/600.0 AS rate_per_s
      |FROM events GROUP BY 1, 2""".stripMargin

  // M4: time-bucket histogram — hour-of-day occupancy per sensor.
  private def histogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))

  private val histogramSql =
    """SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
      |  count(*) AS n, CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_c
      |FROM events GROUP BY 1, 2""".stripMargin

  // Shared bounded-value-grid percentile engine (round-14: the P19
  // corpus_deciles / R30 table_stats construction applied to M5/M7).
  // Spark's exact `percentile` aggregate buffers a per-group
  // value→count MAP that rides the shuffle and lives in one agg buffer
  // — O(ndv-per-group) memory, the one plan shape that dies when a
  // sensor's value domain grows with the corpus. Here the corpus
  // collapses to the (key, value) GRID in one map-side-partial
  // hash-agg (the shuffle carries distinct values, and grid memory is
  // sort-spillable, never a single buffer); cumulative counts are a
  // window over the grid; the two interpolation neighbours v_i,
  // v_{i+1} at h = p·(n−1) fall out of ONE conditional-min hash-agg;
  // and because p = k/d is rational, `result·d` is exact int64 — the
  // round(·,4) value hash-compares with `quantile_cont` by
  // construction (the true percentile of integer inputs at d ∈ {2,10}
  // is a multiple of 0.1, on-grid for round-4, so both engines' ≤½ulp
  // double error snaps to the same value).
  //
  // `grid` must be (key, v: long, cnt: long) with one row per distinct
  // value; `pcts` are (outName, k, d) for percentile k/d; `extra`
  // aggregates are evaluated over the same grid (e.g. sum(cnt·v)).
  // Returns key, n_ (total count), extra…, and one rounded double per
  // percentile.
  private[graft] def gridPercentiles(grid: DataFrame, key: String, v: String,
      pcts: Seq[(String, Int, Int)],
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val g = grid
      .withColumn("ccnt", sum(col("cnt")).over(wOrd))
      .withColumn("ntot", sum(col("cnt")).over(wAll))
    // 0-indexed lower neighbour: i = floor((n−1)·k/d), exact integers.
    val pctAggs = pcts.flatMap { case (name, k, dDen) =>
      val i = expr(s"((ntot - 1) * $k) div $dDen")
      Seq(
        min(when(col("ccnt") - col("cnt") <= i && i < col("ccnt"), col(v)))
          .as(s"__${name}_lo"),
        min(when(col("ccnt") - col("cnt") <= i + 1 && i + 1 < col("ccnt"), col(v)))
          .as(s"__${name}_hi"))
    }
    val allAggs = (max(col("ntot")).as("n_") +: pctAggs) ++ extra
    val agged = g.groupBy(key).agg(allAggs.head, allAggs.tail: _*)
    pcts.foldLeft(agged) { case (df, (name, k, dDen)) =>
      val rem = expr(s"((n_ - 1) * $k) % $dDen")
      val lo = col(s"__${name}_lo")
      // i+1 = n (only when rem = 0) leaves hi null — weight is 0 there
      val hi = coalesce(col(s"__${name}_hi"), lo)
      df.withColumn(name,
          round((lo * dDen + rem * (hi - lo)).cast("double") / dDen, 4))
        .drop(s"__${name}_lo", s"__${name}_hi")
    }
  }

  // M5: exact interpolated percentiles per sensor, via the bounded
  // value grid above (no Percentile map buffer anywhere in the plan —
  // pinned by Round14Spec). Engines interpolate with
  // differently-ordered arithmetic (last-ulp drift), but on integer
  // cents every true percentile is a multiple of 0.1, so round(·,4)
  // is exact on both sides.
  private def percentiles(s: SparkSession, d: String): DataFrame = {
    val grid = Tables.events(s, d)
      .groupBy(col("event_type"), cents(col("value")).as("v"))
      .agg(count(lit(1)).as("cnt"))
    gridPercentiles(grid, "event_type", "v",
      Seq(("p50_c", 1, 2), ("p90_c", 9, 10)))
      .withColumnRenamed("n_", "n")
      .select("event_type", "p50_c", "p90_c", "n")
  }

  private val percentilesSql =
    """SELECT event_type,
      |  round(quantile_cont(CAST(round(value*100,0) AS BIGINT), 0.5), 4) AS p50_c,
      |  round(quantile_cont(CAST(round(value*100,0) AS BIGINT), 0.9), 4) AS p90_c,
      |  count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // M11 `metric_slo_burn`: the SRE multi-window burn-rate page — the
  // alert shape production monitoring actually runs on top of exactly
  // the rate/ratio machinery surge's metrics module exposes (and the
  // threshold-signal idea of W4, graded against an error BUDGET
  // instead of a raw count). SLO: error ratio ≤ 10%. Page when the
  // burn rate (observed/budget) is ≥ 2× over the LONG window (1 h)
  // AND still ≥ 2× over the SHORT confirm window (the hour's last
  // 10 min) — the two-window form that neither flaps on blips nor
  // pages hours after recovery. ONE conditional hash-agg over one
  // scan per (shard, hour); both burn tests are exact integer
  // cross-multiplies (err·10000 ≥ n·2000), no FP ratios.
  private def sloBurn(s: SparkSession, d: String): DataFrame =
    sloBurnAgg(Tables.events(s, d))

  // The agg body is reusable verbatim on the streaming engine (M12
  // `stream_slo_burn` runs it in complete mode): one conditional
  // hash-agg, so the stream side gets map-side partial aggregation
  // and bounded per-(shard,hour) state for free.
  private[graft] def sloBurnAgg(events: DataFrame): DataFrame = {
    val e = expr("cast(floor(unix_timestamp(ts)) as bigint)")
    val isErr = (col("event_type") === "error").cast("long")
    events
      .withColumn("shard", pmod(col("user_id"), lit(16L)))
      .withColumn("bucket_s", expr("(cast(floor(unix_timestamp(ts)) as bigint) div 3600) * 3600"))
      .withColumn("in_short", (e - col("bucket_s") >= 3000L).cast("long"))
      .groupBy("shard", "bucket_s")
      .agg(
        count(lit(1)).as("long_n"),
        sum(isErr).as("long_err"),
        sum(col("in_short")).as("short_n"),
        sum(isErr * col("in_short")).as("short_err"))
      .withColumn("page",
        col("short_n") >= 1L &&
          col("long_err") * 10000L >= col("long_n") * 2000L &&
          col("short_err") * 10000L >= col("short_n") * 2000L)
  }

  private[graft] val sloBurnSql =
    """WITH e AS (
      |  SELECT user_id % 16 AS shard,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      |  FROM events),
      |g AS (
      |  SELECT shard, bucket_s, count(*) AS long_n,
      |    CAST(sum(is_err) AS BIGINT) AS long_err,
      |    CAST(sum(CASE WHEN es - bucket_s >= 3000 THEN 1 ELSE 0 END) AS BIGINT) AS short_n,
      |    CAST(sum(CASE WHEN es - bucket_s >= 3000 THEN is_err ELSE 0 END) AS BIGINT) AS short_err
      |  FROM e GROUP BY 1, 2)
      |SELECT shard, bucket_s, long_n, long_err, short_n, short_err,
      |  short_n >= 1 AND long_err * 10000 >= long_n * 2000
      |    AND short_err * 10000 >= short_n * 2000 AS page
      |FROM g""".stripMargin

  // M7: Timer — duration statistics per sensor
  // (`modules/metrics/src/main/scala/surge/metrics/Timer.scala`: a
  // Timer records elapsed times and exposes rate + percentiles). The
  // event log carries no explicit durations, so the timed quantity is
  // the inter-arrival gap per sensor — lag diff in exact epoch
  // seconds, then the same exact-percentile treatment as M5.
  /** All N−1 inter-arrival gaps per sensor in exact epoch seconds —
    * WITHOUT the 5-partition corpus sort the naive per-type lag window
    * forces (|event_type| = 5 ⇒ the whole log sorts in 5 tasks; the
    * sf100 probe measured the old shape at 130 s with 1.7 GB of sort
    * spill). The E24 bounded-grid decomposition applied to LAG:
    * hour-bucket the log, lag WITHIN (type, bucket) partitions
    * (parallelism = types × hours — grows with the time span, i.e.
    * with the data), and stitch bucket BOUNDARIES on the tiny
    * (type, bucket) grid: first(bucket) − last(previous bucket), a
    * window over grid rows only. The union is exactly the naive
    * window's gap multiset: consecutive differences of a sorted
    * multiset are tie-order-invariant, and the bucket id is monotone
    * in ts so cross-bucket order is preserved by construction. */
  private[graft] def interArrivalGaps(events: DataFrame): DataFrame = {
    val e = events
      .select(col("event_type"), Tables.epochS(col("ts")).as("ts_s"),
        col("event_id"))
      .withColumn("bucket", expr("ts_s div 3600"))
    val wIn = Window.partitionBy("event_type", "bucket")
      .orderBy("ts_s", "event_id")
    val inner = e
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(wIn))
      .filter(col("gap_s").isNotNull)
      .select(col("event_type"), col("gap_s"))
    val grid = e.groupBy("event_type", "bucket")
      .agg(min(col("ts_s")).as("first_ts"), max(col("ts_s")).as("last_ts"))
    val wB = Window.partitionBy("event_type").orderBy("bucket")
    val boundary = grid
      .withColumn("gap_s", col("first_ts") - lag(col("last_ts"), 1).over(wB))
      .filter(col("gap_s").isNotNull)
      .select(col("event_type"), col("gap_s"))
    inner.unionByName(boundary)
  }

  private def timer(s: SparkSession, d: String): DataFrame = {
    val grid = interArrivalGaps(Tables.events(s, d))
      .groupBy(col("event_type"), col("gap_s").as("v"))
      .agg(count(lit(1)).as("cnt"))
    gridPercentiles(grid, "event_type", "v",
      Seq(("p50_gap", 1, 2), ("p90_gap", 9, 10)),
      extra = Seq(sum(col("cnt") * col("v")).as("sum_gap_s")))
      .withColumnRenamed("n_", "n_gaps")
      .withColumn("mean_gap",
        col("sum_gap_s").cast("double") / col("n_gaps").cast("double"))
      .select("event_type", "n_gaps", "sum_gap_s", "p50_gap", "p90_gap", "mean_gap")
  }

  private val timerSql =
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |        OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_s
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
      |  round(quantile_cont(gap_s, 0.5), 4) AS p50_gap,
      |  round(quantile_cont(gap_s, 0.9), 4) AS p90_gap,
      |  CAST(sum(gap_s) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS mean_gap
      |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin

  // M10 `metric_apdex`: the Apdex SLA score per sensor — the single
  // "are users happy" number operations dashboards derive from a
  // timer's durations (satisfied ≤ T, tolerating ≤ 4T, frustrated
  // above; score = (satisfied + tolerating/2) / total). Durations are
  // M7's inter-arrival gaps; the score is an exact e4 integer
  // cross-multiply — (10000·(2·sat+tol)) div (2·total) — so it
  // hash-compares across engines. ONE conditional hash-agg over the
  // same windowed scan M7 runs; T chosen at the measured median gap
  // so all three bands populate in the synthetic log.
  private val apdexT = 900L // satisfied threshold, seconds; tolerating ≤ 4T

  private def apdex(s: SparkSession, d: String): DataFrame = {
    // durations = M7's inter-arrival gaps, via the same bucketed-lag
    // decomposition (the naive shared shape was a 5-partition sort)
    interArrivalGaps(Tables.events(s, d))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("gap_s") <= apdexT, 1L).otherwise(0L)).as("n_sat"),
        sum(when(col("gap_s") > apdexT && col("gap_s") <= 4L * apdexT, 1L)
          .otherwise(0L)).as("n_tol"))
      .withColumn("apdex_e4", expr("(10000 * (2 * n_sat + n_tol)) div (2 * n_total)"))
  }

  private val apdexSql =
    s"""WITH g AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT)
       |      - lag(CAST(floor(epoch(ts)) AS BIGINT))
       |        OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_s
       |  FROM events)
       |SELECT event_type, count(*) AS n_total,
       |  CAST(sum(CASE WHEN gap_s <= $apdexT THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
       |  CAST(sum(CASE WHEN gap_s > $apdexT AND gap_s <= ${4 * apdexT} THEN 1 ELSE 0 END) AS BIGINT) AS n_tol,
       |  (10000 * (2 * CAST(sum(CASE WHEN gap_s <= $apdexT THEN 1 ELSE 0 END) AS BIGINT)
       |    + CAST(sum(CASE WHEN gap_s > $apdexT AND gap_s <= ${4 * apdexT} THEN 1 ELSE 0 END) AS BIGINT)))
       |    // (2 * count(*)) AS apdex_e4
       |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin

  // M8 `metric_consumer_lag`: the catch-up dashboard — per shard, how
  // far the materialized state trails the log head. Surge's init path
  // BLOCKS on exactly this number reaching zero before opening the
  // store (`KTableInitializationSupport` restores the snapshot and
  // replays the delta; `KafkaConsumerStateTrackingActor` /
  // `PartitionAssignments` track per-partition progress for the
  // rebalance view). Modeled with the E13 snapshot cutoff as the
  // applied watermark: pending events, applied head, log head, and the
  // lag in seconds, per shard — ONE hash-agg over one scan.
  /** The lag aggregation over any events frame — one hash-agg of
    * conditional aggregates, so it runs unchanged on the streaming
    * engine (complete mode; see [[graft.streaming.Streams]]'s
    * stream_consumer_lag twin). */
  private[graft] def consumerLagAgg(df: DataFrame): DataFrame = {
    val cut = lit("2024-01-20 00:00:00").cast("timestamp")
    df.groupBy(pmod(col("user_id"), lit(16L)).as("shard"))
      .agg(
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n_pending"),
        Tables.epochS(max(when(col("ts") < cut, col("ts")))).as("applied_head_s"),
        Tables.epochS(max(col("ts"))).as("log_head_s"))
      .withColumn("lag_s", col("log_head_s") - col("applied_head_s"))
  }

  private def consumerLag(s: SparkSession, d: String): DataFrame =
    consumerLagAgg(Tables.events(s, d))

  private[graft] val consumerLagSql =
    """SELECT user_id % 16 AS shard,
      |  CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
      |  CAST(floor(epoch(max(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN ts END))) AS BIGINT) AS applied_head_s,
      |  CAST(floor(epoch(max(ts))) AS BIGINT) AS log_head_s,
      |  CAST(floor(epoch(max(ts))) AS BIGINT)
      |    - CAST(floor(epoch(max(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN ts END))) AS BIGINT) AS lag_s
      |FROM events GROUP BY 1""".stripMargin

  // M13 `metric_anomaly`: the alerting primitive every metrics
  // dashboard ends with — which readings page. Surge's sensors expose
  // per-metric statistics (`surge/metrics/statistics/*.scala`); the
  // anomaly gate over them is the 3-sigma rule: flag a reading when
  // (v − mean)² > 9·var. Both sides of that inequality are computed as
  // exact integers on cents — (c·n − S)² > 9·(n·Q − S²) after
  // multiplying through by n² — in decimal(38,0) (Spark) / HUGEINT
  // (DuckDB), so the verdict is bit-identical across engines and, at
  // 100 TB magnitudes (n ~ 1e12, c ~ 1e6 ⇒ terms ≤ ~1e34), never
  // overflows either 38-digit type. Two scans, no wide shuffle: the
  // per-sensor moment table is a tiny hash-agg BROADCAST back onto the
  // second events scan (the T8 pre-aggregated-probe pattern) — the log
  // side never shuffles at any scale.
  /** Per-sensor exact integer moments (n, Σc, Σc²) in decimal(38,0) —
    * the trained baseline the anomaly gate scores against. */
  private[graft] def anomalyMoments(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), cents(col("value")).as("c"))
      .groupBy("event_type").agg(
        count(lit(1)).cast("decimal(38,0)").as("mn"),
        sum(col("c")).cast("decimal(38,0)").as("ms"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("mq"))

  /** Score a readings frame against broadcast baseline moments — the
    * stateless filter the streaming twin runs per micro-batch. */
  private[graft] def anomalyFlag(ev: DataFrame, moments: DataFrame): DataFrame = {
    val dev = cents(col("value")).cast("decimal(38,0)") * col("mn") - col("ms")
    ev.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(moments), "event_type")
      .filter(dev * dev >
        lit(9).cast("decimal(38,0)") * (col("mn") * col("mq") - col("ms") * col("ms")))
      .select("event_id", "event_type", "value")
  }

  private def anomaly(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    anomalyFlag(ev, anomalyMoments(ev))
  }

  private[graft] val anomalySql =
    """WITH c AS (
      |  SELECT event_id, event_type, value,
      |    CAST(round(value*100,0) AS BIGINT) AS cc
      |  FROM events),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS mn,
      |    CAST(sum(cc) AS HUGEINT) AS ms,
      |    CAST(sum(CAST(cc AS HUGEINT) * cc) AS HUGEINT) AS mq
      |  FROM c GROUP BY 1)
      |SELECT c.event_id, c.event_type, c.value
      |FROM c JOIN s USING (event_type)
      |WHERE (CAST(c.cc AS HUGEINT) * s.mn - s.ms) * (CAST(c.cc AS HUGEINT) * s.mn - s.ms)
      |  > 9 * (s.mn * s.mq - s.ms * s.ms)""".stripMargin

  // M15 `metric_heatmap`: the latency/value heatmap grid behind every
  // ops dashboard — occupancy per (sensor, hour-of-day, $50 value
  // band). M4's histogram collapses value; this keeps the 2-D shape
  // that makes bimodal behavior visible (the grid a UI renders
  // directly). ONE conditional-free hash-agg over one scan; the band
  // is exact integer cents div 5000 capped at 9, so the grid is
  // bounded (|types|·24·10) at any corpus size. The agg body is reused
  // verbatim by the streaming twin (M16 complete mode).
  private[graft] def heatmapAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour_of_day"),
        least(expr("cast(round(value*100,0) as bigint) div 5000"), lit(9L)).as("vband"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))

  private def heatmap(s: SparkSession, d: String): DataFrame =
    heatmapAgg(Tables.events(s, d))

  private[graft] val heatmapSql =
    """SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
      |  least(CAST(round(value*100,0) AS BIGINT) // 5000, 9) AS vband,
      |  count(*) AS n, CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_c
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  // M17 `metric_downsample`: retention downsampling — the
  // open/close/min/max/sum candle per (sensor, hour) every TSDB rolls
  // raw points into when the fine-grained window expires (Kafka
  // metrics → long-term store is exactly this pass). Open and close
  // are packed-decimal argmin/argmax ([[Packed]] — first/last by
  // (ts, event_id) with the cents payload riding in the key), so the
  // WHOLE candle is ONE HashAggregate over one scan: no window, no
  // sort, no first()/last() order-dependence hazard.
  // The agg body is reused verbatim by the streaming twin
  // (stream_downsample, complete mode) — same split as heatmapAgg.
  private[graft] def downsampleAgg(events: DataFrame): DataFrame =
    events
      .withColumn("bucket_s",
        expr("(cast(floor(unix_timestamp(ts)) as bigint) div 3600) * 3600"))
      .groupBy("event_type", "bucket_s")
      .agg(
        count(lit(1)).as("n"),
        min(Packed.latest(col("ts"), col("event_id"), cents(col("value")))).as("opk"),
        max(Packed.latest(col("ts"), col("event_id"), cents(col("value")))).as("cpk"),
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c"),
        sum(cents(col("value"))).as("sum_c"))
      .select(col("event_type"), col("bucket_s"), col("n"),
        Packed.payload(col("opk")).as("open_c"),
        Packed.payload(col("cpk")).as("close_c"),
        col("min_c"), col("max_c"), col("sum_c"))

  private def downsample(s: SparkSession, d: String): DataFrame =
    downsampleAgg(Tables.events(s, d))

  private[graft] val downsampleSql =
    """WITH e AS (
      |  SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
      |    CAST(round(value*100,0) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |a AS (
      |  SELECT event_type, bucket_s, count(*) AS n,
      |    CAST(min(c) AS BIGINT) AS min_c, CAST(max(c) AS BIGINT) AS max_c,
      |    CAST(sum(c) AS BIGINT) AS sum_c
      |  FROM e GROUP BY 1, 2),
      |o AS (
      |  SELECT event_type, bucket_s, c AS open_c FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type, bucket_s
      |      ORDER BY ts, event_id) AS rn FROM e) WHERE rn = 1),
      |cl AS (
      |  SELECT event_type, bucket_s, c AS close_c FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type, bucket_s
      |      ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1)
      |SELECT a.event_type, a.bucket_s, a.n, o.open_c, cl.close_c,
      |  a.min_c, a.max_c, a.sum_c
      |FROM a JOIN o USING (event_type, bucket_s)
      |       JOIN cl USING (event_type, bucket_s)""".stripMargin

  // M19 `metric_forecast`: the seasonal-baseline forecast eval — train
  // a per-(sensor, hour-of-day) mean on the first 20 days, grade it on
  // the rest (n, exact sum-absolute-error, MAE, signed bias mass).
  // This is the capacity-planning / anomaly-threshold baseline every
  // metrics store grows ("what does Tuesday 14:00 normally look
  // like"), and the eval harness is the part that matters: a baseline
  // nobody scores drifts silently. Model = one hash-agg over the
  // train window collapsed to the bounded (sensor, hod) grid and
  // BROADCAST; scoring = one conditional pass over the eval window
  // joined to that grid (the T8/M13 pre-aggregated-probe shape — the
  // log never shuffles); all error mass exact integer cents (signed
  // bias emitted as a SUM, not a mean — integer division of negatives
  // rounds differently across engines).
  private[graft] val forecastCut = "2024-01-21 00:00:00"

  private def hodProjected(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      hour(col("ts")).cast("long").as("hour_of_day"),
      cents(col("value")).as("c"), col("ts"))

  /** The (sensor, hour-of-day) floor-mean model over the train window
    * — tiny, broadcast by every consumer. */
  private[graft] def forecastModel(events: DataFrame): DataFrame =
    hodProjected(events)
      .filter(col("ts") < lit(forecastCut).cast("timestamp"))
      .groupBy("event_type", "hour_of_day")
      .agg(sum(col("c")).as("ts_sum"), count(lit(1)).as("n"))
      .select(col("event_type"), col("hour_of_day"),
        expr("ts_sum div n").as("pred_c"))

  /** Scoring agg over the eval window — reused verbatim by the
    * streaming twin (stream_forecast, complete mode). */
  private[graft] def forecastEvalAgg(events: DataFrame, model: DataFrame): DataFrame =
    hodProjected(events)
      .filter(col("ts") >= lit(forecastCut).cast("timestamp"))
      .join(broadcast(model), Seq("event_type", "hour_of_day"))
      .groupBy("event_type", "hour_of_day", "pred_c")
      .agg(count(lit(1)).as("n_test"),
        sum(abs(col("c") - col("pred_c"))).as("sae_c"),
        sum(col("c") - col("pred_c")).as("bias_sum_c"))
      .select(col("event_type"), col("hour_of_day"), col("pred_c"),
        col("n_test"), col("sae_c"),
        expr("sae_c div n_test").as("mae_c"), col("bias_sum_c"))

  private def forecast(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    forecastEvalAgg(ev, forecastModel(ev))
  }

  private[graft] val forecastSql =
    s"""WITH e AS (
       |  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
       |    CAST(round(value*100,0) AS BIGINT) AS c, ts
       |  FROM events),
       |m AS (
       |  SELECT event_type, hour_of_day,
       |    CAST(CAST(sum(c) AS BIGINT) // count(*) AS BIGINT) AS pred_c
       |  FROM e WHERE ts < TIMESTAMP '$forecastCut' GROUP BY 1, 2)
       |SELECT e.event_type, e.hour_of_day, m.pred_c, count(*) AS n_test,
       |  CAST(sum(abs(c - pred_c)) AS BIGINT) AS sae_c,
       |  CAST(CAST(sum(abs(c - pred_c)) AS BIGINT) // count(*) AS BIGINT) AS mae_c,
       |  CAST(sum(c - pred_c) AS BIGINT) AS bias_sum_c
       |FROM e JOIN m USING (event_type, hour_of_day)
       |WHERE e.ts >= TIMESTAMP '$forecastCut'
       |GROUP BY 1, 2, 3""".stripMargin

  // M21 `metric_availability`: the uptime dashboard — per (sensor,
  // day): hours with ≥1 reading, observed span, and availability as
  // an exact e4 share of 24 hours. A sensor that stops reporting IS
  // the incident (W17's silence detector per aggregate; THIS is the
  // fleet-facing daily roll-up SLAs quote). The log collapses to the
  // distinct (sensor, day, hour) grid in one agg; the day roll-up is
  // a second agg over that bounded grid.
  /** Day roll-up over any observed (event_type, day, hr) grid —
    * bounded by construction; shared with the streaming twin. */
  private[graft] def availabilityRollup(grid: DataFrame): DataFrame =
    grid
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_hours"),
        min(col("hr")).as("first_hr"), max(col("hr")).as("last_hr"))
      .select(col("event_type"), col("day"), col("n_hours"),
        (col("last_hr") - col("first_hr") + 1).as("span_hours"),
        expr("(10000 * n_hours) div 24").as("avail_e4"))

  /** The observed-hour grid; the corpus-collapsing stage (reused by
    * the streaming twin as a complete-mode agg over the same keys). */
  private[graft] def observedHours(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"),
        expr("unix_timestamp(ts) div 3600").as("hr"))
      .groupBy("event_type", "day", "hr").agg(count(lit(1)).as("n"))

  private def availability(s: SparkSession, d: String): DataFrame =
    availabilityRollup(observedHours(Tables.events(s, d)))

  private[graft] val availabilitySql =
    """WITH u AS (
      |  SELECT DISTINCT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr
      |  FROM events)
      |SELECT event_type, day, count(*) AS n_hours,
      |  CAST(max(hr) - min(hr) + 1 AS BIGINT) AS span_hours,
      |  CAST((10000 * count(*)) // 24 AS BIGINT) AS avail_e4
      |FROM u GROUP BY 1, 2""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("metric_availability", availability, Some(availabilitySql)),
    Op("metric_forecast", forecast, Some(forecastSql)),
    Op("metric_downsample", downsample, Some(downsampleSql)),
    Op("metric_heatmap", heatmap, Some(heatmapSql)),
    Op("metric_anomaly", anomaly, Some(anomalySql)),
    Op("metric_apdex", apdex, Some(apdexSql)),
    Op("metric_slo_burn", sloBurn, Some(sloBurnSql)),
    Op("metric_consumer_lag", consumerLag, Some(consumerLagSql)),
    Op("metric_timer", timer, Some(timerSql)),
    Op("metric_percentile", percentiles, Some(percentilesSql)),
    Op("metric_stats", stats, Some(statsSql)),
    Op("metric_ewma", ewma, Some(ewmaSql)),
    Op("metric_rate", rate, Some(rateSql)),
    Op("metric_histogram", histogram, Some(histogramSql)))
}
