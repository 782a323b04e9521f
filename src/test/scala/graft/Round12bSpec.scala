package graft

import org.apache.spark.sql.functions._

/** Round 12, second tranche: the Bloom runtime-filter semi join (R27)
  * and the live decile board (P21 `stream_deciles`).
  *
  * R27's contract is exactness THROUGH approximation: the Bloom
  * pre-filter may pass false positives (removed by the exact semi
  * join) but can never drop a true match — a Bloom filter has no
  * false negatives by construction — so the result is bit-identical
  * to the plain EXISTS while the fact side sheds non-matching rows at
  * the scan, before any exchange. Both halves are pinned here: frame
  * equality with the un-filtered semi join, and the plan shape (the
  * might_contain probe sits in the fact scan's filter, below the
  * join).
  *
  * P21's parity is structural (the verdict join runs through
  * Pipeline.decilesFromGrid — the literal batch code path — and the
  * driver oracle is P19's); the spec adds the direct frame-equality
  * check the other streaming twins carry.
  */
class Round12bSpec extends SparkSpec {

  test("semi_join_bloom equals the plain exists semi join (bloom adds no result change)") {
    val got = run("semi_join_bloom").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = graft.sources.Tables.customer(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == plain)
  }

  test("semi_join_bloom probes the bloom below the join, in the fact scan's stage") {
    val plan = run("semi_join_bloom").queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$plan")
    // the probe must be a Filter below the join, not a post-join step:
    // everything after the join node's line must still contain the
    // might_contain filter (plans print top-down, join above its children)
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"might_contain must sit below the semi join:\n$plan")
  }

  test("dedup_bloom_gate equals the plain digest left-join gate (no false negatives possible)") {
    val got = run("dedup_bloom_gate").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val t = graft.sources.Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head().getLong(0) * 4L / 5L
    val base = docs.filter(col("doc_id") <= t)
      .groupBy("h").agg(min(col("doc_id")).as("dup_of"))
    val plain = docs.filter(col("doc_id") > t)
      .join(base, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "dup").otherwise("new").as("verdict"),
        col("dup_of"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == plain)
    // sf0.001's 100 new docs contain no byte-exact dup of the base 400
    // (spec-scale data property — dup coverage is exercised by the
    // sf0.01 driver oracle and the sf100 probe's 1M-row verdict set)
    assert(got.nonEmpty && got.forall(v => v._2 == "dup" || v._2 == "new"))
  }

  test("stream_deciles equals batch corpus_deciles frame-for-frame") {
    val streamed = run("stream_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = run("corpus_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("the streamed grid merge is a true monoid append (base ⊕ streamed tiles the corpus)") {
    // every doc is counted exactly once across the static base grid
    // and the streamed split source: total grid mass == corpus size
    val n = graft.sources.Tables.documents(spark, sf).count()
    val gridMass = run("stream_deciles").count()
    assert(gridMass == n, s"decile board covers $gridMass of $n docs")
  }
}
