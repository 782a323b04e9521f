package graft

import org.apache.spark.sql.functions._

/** The custom physical operator: planner wiring and equivalence with
  * the window-function form. */
class TopKOperatorSpec extends SparkSpec {

  test("plan uses TopKPerKeyExec with a planner-inserted hash exchange") {
    val df = run("topk_custom")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // crucially: no Sort operator — that's the point vs row_number
    assert(!plan.contains("+- Sort "), plan)
  }

  test("custom operator equals window row_number <= k") {
    val custom = run("topk_custom").collect().map(_.toSeq).toSet
    val window = run("topk_per_group").drop("rn").collect().map(_.toSeq).toSet
    assert(custom == window)
  }

  test("k larger than group size keeps every row") {
    val base = graft.sources.Tables.nation(spark, sf)
      .select(col("n_regionkey").cast("string").as("k"),
        col("n_nationkey").cast("long").as("score"),
        col("n_nationkey").cast("long").as("tie"))
    val out = graft.plans.TopK.topKPerKey(base, 100, "k", "score", "tie")
    assert(out.count() == base.count())
  }

  test("double scores rank exactly like the window form (sortable-bits order)") {
    // negatives, ±0, subnormals, and exact ties all ride the int64
    // heap through the order-preserving bit transform — verify against
    // the reference row_number() ordering on a deterministic mixed set
    val base = graft.sources.Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("k"),
        // mixed-sign doubles with repeats: (value - 50) / 7 hits
        // negatives and positives; the floor makes exact ties
        (floor(col("value")) - lit(50.0)).divide(lit(7.0)).as("score"),
        col("event_id").cast("long").as("tie"))
    val custom = graft.plans.TopK.topKPerKey(base, 3, "k", "score", "tie")
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("tie"))
    val window = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn").collect().map(_.toSeq).toSet
    assert(custom == window)
  }

  test("a coarser distribution key that determines the group key needs no extra exchange") {
    // cluster on k2 = k div 4 (functionally determines nothing — the
    // REVERSE: k determines k2), so distKey k2 is coarser than the
    // grouping key k: every k's rows still land in one k2 partition
    val base = graft.sources.Tables.events(spark, sf)
      .select(col("user_id").as("k"),
        (col("user_id") % 4).as("k2"),
        col("event_id").as("score"), col("event_id").as("tie"))
      .repartition(8, col("k2"))
    val df = graft.plans.TopK.topKPerKeyIn(base, 2, "k", "score", "tie", "k2")
    val plan = df.queryExecution.executedPlan.toString
    // the explicit repartition's exchange satisfies the operator's
    // clustering requirement — EnsureRequirements must not add another
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    val custom = df.select("k", "score", "tie").collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("tie"))
    val window = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("k", "score", "tie")
      .collect().map(_.toSeq).toSet
    assert(custom == window)
  }
}
