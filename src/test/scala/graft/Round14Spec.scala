package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-14 additions: the M5/M7 bounded-value-grid percentile rewrite
  * (the r11 verdict's one `weak` item — the last O(ndv-per-group)
  * aggregate buffer on a hot path is gone) with an exact plain-Scala
  * quantile_cont replay pinning the interpolation arithmetic.
  */
class Round14Spec extends SparkSpec {

  test("M5/M7: no Percentile map buffer, no sort-agg, anywhere in the plan") {
    for (name <- Seq("metric_percentile", "metric_timer")) {
      val plan = run(name).queryExecution.executedPlan.toString
      // Spark's exact `percentile` is a TypedImperativeAggregate whose
      // buffer is a per-group value→count map — it plans as
      // ObjectHashAggregate and names the function in the agg list.
      assert(!plan.contains("ObjectHashAggregate"),
        s"$name regressed to a map-buffer aggregate:\n$plan")
      assert(!plan.toLowerCase.contains("percentile("),
        s"$name still calls the buffering percentile aggregate:\n$plan")
      assert(!plan.contains("SortAggregate"),
        s"$name picked up a SortAggregate:\n$plan")
    }
  }

  test("gridPercentiles == plain-Scala quantile_cont on ties and edges") {
    import scala.jdk.CollectionConverters._
    val pcts = Seq(("p50", 1, 2), ("p90", 9, 10))
    // quantile_cont (type-7) replay in exact rational arithmetic:
    // h = p(n−1), i = ⌊h⌋, res = v(i) + (h−i)(v(i+1)−v(i)).
    def replay(vs: Seq[Long], k: Int, d: Int): Double = {
      val sorted = vs.sorted.toIndexedSeq
      val n = sorted.size.toLong
      val i = ((n - 1) * k) / d
      val rem = ((n - 1) * k) % d
      val lo = sorted(i.toInt)
      val hi = if (rem == 0) lo else sorted(i.toInt + 1)
      BigDecimal((lo * d + rem * (hi - lo)).toDouble / d)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rnd = new scala.util.Random(14)
    val datasets: Seq[(String, Seq[Long])] = Seq(
      "single"   -> Seq(42L),
      "pair"     -> Seq(10L, 20L),
      "allequal" -> Seq.fill(17)(7L),
      "tied"     -> Seq(1L, 1L, 1L, 2L, 2L, 9L, 9L, 9L, 9L, 9L),
      "rand37"   -> Seq.fill(37)(rnd.nextInt(2000).toLong - 1000L),
      "rand100"  -> Seq.fill(100)(rnd.nextInt(50).toLong),
      "dense11"  -> (0L to 10L),
      "neg"      -> Seq(-5L, -5L, -3L, 0L, 8L))
    val rows = datasets.flatMap { case (key, vs) => vs.map(v => Row(key, v)) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val grid = df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
    val got = graft.operators.MetricsOps
      .gridPercentiles(grid, "k", "v", pcts,
        extra = Seq(sum(col("cnt") * col("v")).as("sum_v")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_"), r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Long]("sum_v"))).toMap
    for ((key, vs) <- datasets) {
      val (n, p50, p90, sumv) = got(key)
      assert(n == vs.size, s"$key n")
      assert(sumv == vs.sum, s"$key extra aggregate over the grid")
      assert(p50 == replay(vs, 1, 2), s"$key p50: got $p50")
      assert(p90 == replay(vs, 9, 10), s"$key p90: got $p90")
    }
  }
}
