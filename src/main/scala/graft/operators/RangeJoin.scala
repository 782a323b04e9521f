package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables
import graft.sources.Tables.cents

/** R12: interval (range) join — events against time windows, the
  * "which window was this signal inside" lookup surge's windowed health
  * stream answers per signal.
  *
  * Spark-first: a naive range join is a cross product with a residual
  * filter (O(n·m)). Instead each interval is exploded into the hour
  * buckets it covers and the join is an equi-join on the bucket key +
  * residual range filter — at 100 TB this is the difference between a
  * broadcast-nested-loop over every event and a hash join whose build
  * side is |intervals|·(hours per interval).
  *
  * Intervals are synthesized deterministically: 24 six-hour windows,
  * one starting every 30 h from 2024-01-01 (both engines generate the
  * same table from `range`).
  */
object RangeJoin extends OpFamily {

  private val epoch20240101 = 1704067200L

  private def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val intervals = s.range(24).select(
      col("id").as("interval_id"),
      (lit(epoch20240101) + col("id") * 108000L).as("start_s"))
      .withColumn("end_s", col("start_s") + 21600L)
    // explode each interval into its covered hour buckets
    // `div`, not `/`: Spark's `/` on longs is double division
    val buckets = intervals.select(col("interval_id"), col("start_s"), col("end_s"),
      explode(sequence(expr("start_s div 3600"), expr("(end_s - 1) div 3600"))).as("hb"))
    val ev = Tables.events(s, d)
      .select(unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
      .withColumn("hb", expr("ts_s div 3600"))
    ev.join(broadcast(buckets), Seq("hb"))
      .filter(col("ts_s") >= col("start_s") && col("ts_s") < col("end_s"))
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
  }

  private val rangeJoinSql =
    s"""WITH iv AS (
       |  SELECT i AS interval_id, $epoch20240101 + i*108000 AS start_s,
       |         $epoch20240101 + i*108000 + 21600 AS end_s
       |  FROM range(0, 24) t(i)),
       |ev AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
       |         CAST(round(value*100,0) AS BIGINT) AS c
       |  FROM events)
       |SELECT interval_id, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_c
       |FROM ev JOIN iv ON ev.ts_s >= iv.start_s AND ev.ts_s < iv.end_s
       |GROUP BY interval_id""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("range_join", rangeJoin, Some(rangeJoinSql)))
}
