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
}
