package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 second wave (exact similarity
  * join, LSH recall eval, streaming gap tracking). */
class Round7bSpec extends SparkSpec {

  test("dedup_exact_join: threshold exact, exhaustive over LSH-verified pairs, dups at J=1") {
    val truth = run("dedup_exact_join").cache()
    truth.collect().foreach { r =>
      val (i, u) = (r.getAs[Long]("inter_n"), r.getAs[Long]("union_n"))
      assert(2L * i >= u, s"pair below tau=0.5 leaked: $i/$u")
      assert(i <= u)
    }
    // exhaustiveness cross-check against the INDEPENDENT D3 path: every
    // LSH-candidate pair whose exact Jaccard reaches 0.5 must be found
    // by the prefix-filter join too (truth is a superset of that set)
    val d3 = run("ngram_jaccard")
      .filter(lit(2L) * col("inter_n") >= col("union_n"))
      .select("doc_a", "doc_b")
    val missed = d3.join(truth.select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0L, s"$missed D3-verified pairs missing from the exact join")
    // exact duplicates (identical text) are J=1 pairs: inter == union
    val dupPairs = truth.filter(col("inter_n") === col("union_n")).count()
    val dupDocs = run("dedup_exact").filter(col("n_copies") > 1)
    if (dupDocs.count() > 0) assert(dupPairs > 0L,
      "corpus has exact duplicates but the join found no J=1 pair")
  }

  test("dedup_recall: counters reconcile with the frames they summarize") {
    val r = run("dedup_recall").collect()(0)
    val (nTrue, nCand, nHit) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(nHit <= math.min(nTrue, nCand))
    assert(r.getAs[Long]("recall_e4") == 10000L * nHit / nTrue)
    assert(r.getAs[Long]("precision_e4") == 10000L * nHit / nCand)
    // independent recount from the two source frames
    val truth = run("dedup_exact_join").select("doc_a", "doc_b")
    val cand = run("dedup_minhash_lsh").select("doc_a", "doc_b")
    assert(truth.count() == nTrue)
    assert(cand.count() == nCand)
    assert(truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count() == nHit)
    // the 4x4 band shape sits at tau~0.7: against a 0.5 truth it must
    // find the high-J pairs (exact dups are always candidates) without
    // being vacuously perfect on precision
    assert(nHit > 0L)
    assert(nCand > nHit, "LSH candidates should include sub-threshold pairs")
  }

  test("stream_gaps equals the batch signal_gaps view row-for-row") {
    val batch = run("signal_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stream = run("stream_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
