package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The mergeable-sketch tier (SURVEY §2 R26 / M23, spec-checked — the
  * approximate answers are engine-specific so a DuckDB hash oracle
  * cannot apply; the CONTRACTS are pinned here instead).
  *
  * At 100 TB the distinct-count and percentile questions are asked of
  * PRE-AGGREGATED shard summaries, not the raw corpus: each ingest
  * shard persists a fixed-size sketch once, and every later query
  * merges sketches instead of re-scanning. That only works if the
  * sketches are true commutative monoids — merge(shard sketches) must
  * equal sketch(whole corpus) — and if the error is bounded. Both
  * properties are laws, not tunings, so they are spec-pinned:
  *
  *  - R26 `distinct_sketch_shards`: Spark's DataSketches HLL
  *    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate). Dense
  *    HLL merge is a per-register MAX, but the DataSketches sketch
  *    passes through exact coupon modes (LIST/SET) whose transition
  *    points depend on how the stream was grouped — MEASURED here:
  *    shard-merged 989 vs direct 996 vs exact ~996 at sf0.001, and
  *    8- vs 32-shard layouts differ by 1. So estimate equality is NOT
  *    the contract; the contract is the error envelope: every layout's
  *    estimate sits within the published relative-standard-error of
  *    the exact count (lgK=12 ⇒ rse ≈ 1.04/√4096 ≈ 1.6%; we assert
  *    5%), and layouts agree with each other well inside it.
  *  - M23 `metric_percentile_sketch`: approx_percentile's
  *    Greenwald-Khanna summary guarantees RANK error ≤ n/accuracy.
  *    The returned value must be an actual element whose rank is
  *    within that bound of the target rank (a value-distance bound
  *    would be distribution-dependent and is NOT the contract).
  */
class SketchSpec extends SparkSpec {

  test("R26: shard-merged HLL estimate sits in the error envelope of the exact count") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"))
      .withColumn("shard", pmod(col("user_id"), lit(16L)))
    // the shard tier a 100 TB layout persists: one bounded sketch per shard
    val shardSketches = e.groupBy("shard")
      .agg(hll_sketch_agg(col("event_id")).as("sk"))
    val merged = shardSketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("event_id"))).as("est"))
      .head().getLong(0)
    val exact = e.select("event_id").distinct().count()
    for ((label, est) <- Seq("merged" -> merged, "direct" -> direct)) {
      val rel = math.abs(est - exact).toDouble / exact
      assert(rel <= 0.05, s"$label estimate $est vs exact $exact: rel err $rel > 5%")
    }
    // the scale contract: the merged tier reads |shards| sketch rows,
    // each of bounded size, never the corpus
    val maxBytes = shardSketches.select(max(length(col("sk")))).head().getInt(0)
    // sf0.001 has only user_id 0..14, so ≤ 16 shards materialize
    assert(shardSketches.count() <= 16 && maxBytes < 64 * 1024)
  }

  test("R26: shard layouts agree with each other well inside the error envelope") {
    val e = Tables.events(spark, sf).select(col("user_id"), col("event_id"))
    val exact = e.select("event_id").distinct().count()
    def est(nShards: Long): Long = e
      .withColumn("shard", pmod(col("user_id"), lit(nShards)))
      .groupBy("shard").agg(hll_sketch_agg(col("event_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val (e8, e32) = (est(8L), est(32L))
    assert(math.abs(e8 - e32).toDouble / exact <= 0.02,
      s"layouts drifted: 8 shards $e8 vs 32 shards $e32 (exact $exact)")
  }

  test("M23: approx_percentile's returned value has rank within n/accuracy of target") {
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").as("v"))
    val n = vals.count()
    val sorted = vals.collect().map(_.getDouble(0)).sorted
    for (acc <- Seq(100, 1000); q <- Seq(0.5, 0.95, 0.99)) {
      val got = vals
        .agg(expr(s"approx_percentile(v, $q, $acc)").cast("double"))
        .head().getDouble(0)
      // rank window of the returned value among the sorted data
      val lo = sorted.count(_ < got).toLong
      val hi = sorted.count(_ <= got).toLong
      val target = q * n
      val slack = n.toDouble / acc
      assert(lo - slack <= target && target <= hi + slack,
        s"acc=$acc q=$q: value $got has rank window [$lo,$hi], " +
          s"target $target, allowed slack $slack")
      assert(sorted.contains(got), "GK must return an actual element")
    }
  }

  test("M23: percentile summaries merge across shards (union == whole within rank bound)") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice").as("v"))
    val n = li.count()
    val sorted = li.collect().map(_.getDouble(1)).sorted
    // partial summaries built per shard, merged by the agg itself —
    // grouping then re-aggregating exercises GK's merge path
    val acc = 1000
    val got = li.withColumn("shard", pmod(col("l_orderkey"), lit(16L)))
      .repartition(16, col("shard"))
      .agg(expr(s"approx_percentile(v, 0.9, $acc)").cast("double"))
      .head().getDouble(0)
    val lo = sorted.count(_ < got).toLong
    val hi = sorted.count(_ <= got).toLong
    val target = 0.9 * n
    val slack = n.toDouble / acc
    assert(lo - slack <= target && target <= hi + slack)
  }
}
