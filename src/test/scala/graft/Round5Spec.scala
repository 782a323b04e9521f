package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: Lloyd-refined PQ codebooks, the delta-append
  * live store (see LiveStoreSpec), and the exact-substring dedup. */
class Round5Spec extends SparkSpec {

  test("the PQ Lloyd step strictly reduces quantization distortion") {
    // recall@5 over 25 truth pairs is too coarse to see codebook
    // quality (±1 pair = ±0.04); distortion — the objective Lloyd
    // descends — is the honest metric. Measured: 17% lower at sf0.01.
    val all = functions.Similarity.quantized(spark, sf)
    val (raw, refined) = functions.Similarity.pqCodebooks(all)
    val dRaw = functions.Similarity.pqDistortion(all, raw)
    val dRef = functions.Similarity.pqDistortion(all, refined)
    info(s"pq distortion: raw=$dRaw refined=$dRef (${math.round(100 * (1 - dRef / dRaw))}% lower)")
    assert(dRef < dRaw, s"refined codebook must beat raw seeds: $dRef !< $dRaw")
  }

  test("dedup_substring span arithmetic: exact copies, partial overlap, containment in D1") {
    import spark.implicits._
    def words(r: Range, p: String = "w") = r.map(p + _).mkString(" ")
    // doc 1 ≡ doc 2 (exact 20-token copies: D1 would flag them);
    // doc 3 shares exactly tokens 5..14 (10 tokens) with doc 1;
    // doc 4 shares nothing; doc 5 is a short (<k) exact copy pair with 6
    val docs = Seq(
      (1L, words(0 until 20)),
      (2L, words(0 until 20)),
      (3L, words(5 until 15) + " " + words(0 until 10, "x")),
      (4L, words(0 until 20, "z")),
      (5L, words(0 until 6, "y")),
      (6L, words(0 until 6, "y"))).toDF("doc_id", "text")
    val got = graft.functions.Dedup.substringSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // exact copies: one span covering all 20 tokens — the span pass
    // SUBSUMES document-level exact dedup (D1) for docs ≥ k tokens
    assert(got(1L) == ((1L, 20L, 20L)), s"doc1: ${got.get(1L)}")
    assert(got(2L) == ((1L, 20L, 20L)), s"doc2: ${got.get(2L)}")
    // partial overlap: the shared 10-token run — 3 windows of 8, one
    // maximal span, 10 covered tokens — on BOTH sides of the share
    assert(got(3L) == ((1L, 10L, 10L)), s"doc3: ${got.get(3L)}")
    // doc 1's coverage must NOT double-count the region its two
    // duplicated sources (doc 2 full copy, doc 3 partial) both hit
    assert(!got.contains(4L), "unique doc must not be flagged")
    // sub-k exact copies are invisible to the span pass (that's D1's
    // job) — documented containment boundary
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("ANN probes read the persisted index with partition pruning on bucket/cell") {
    // S2/S3 no longer rebuild the index inside the query: the probe
    // joins a bucket/cell-PARTITIONED table on its partition column and
    // the scan must carry a dynamic pruning predicate there (the E12
    // point-lookup discipline, now for ANN) — file listing is cut to
    // the probed 1/256 (LSH) or probes/k (IVF) before any read
    for ((name, pcol) <- Seq("ann_lsh" -> "bucket", "ann_ivf" -> "cell")) {
      val plan = run(name).queryExecution.executedPlan.toString
      val pruned = s"PartitionFilters: \\[[^\\]]*dynamicpruning[^\\]]*$pcol".r
        .findFirstIn(plan)
        .orElse(s"PartitionFilters: \\[[^\\]]*$pcol[^\\]]*dynamicpruning".r.findFirstIn(plan))
      assert(pruned.isDefined,
        s"$name probe should dynamically prune on $pcol:\n$plan")
    }
  }

  test("ann_ivfpq: both cuts at once — cell-pruned probe, useful recall, deeper probes never hurt") {
    val plan = run("ann_ivfpq").queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning[^\\]]*cell".r.findFirstIn(plan)
      .orElse("PartitionFilters: \\[[^\\]]*cell[^\\]]*dynamicpruning".r.findFirstIn(plan)).isDefined,
      s"ann_ivfpq probe should dynamically prune on cell:\n$plan")
    val truth = run("cosine_topk").filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    def recallAt(probes: Int): Double = {
      val g = functions.Similarity.ivfpq(spark, sf, 16, probes, 5, 64)
        .select(col("q_id"), col("vec_id"))
      g.join(truth, Seq("q_id", "vec_id")).count().toDouble / truth.count()
    }
    val r4p = recallAt(4)
    info(s"ann_ivfpq recall@5: probes=4 -> $r4p, probes=16 -> ${recallAt(16)}")
    assert(r4p >= 0.3, s"ann_ivfpq recall@5 $r4p below 0.3 (4/16 cells + PQ lossiness)")
    assert(recallAt(16) >= r4p, "probing every cell must not lose recall vs 4 cells")
  }

  test("corpus_pack: segments tile each doc exactly and fill every non-final sequence") {
    val got = run("corpus_pack").cache()
    // each doc's segments cover exactly its tokens, first-to-last
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val perDoc = got.groupBy("doc_id")
      .agg(sum("n_span").as("covered"), min("doc_from").as("f"), max("doc_to").as("t"))
    assert(perDoc.join(docs, "doc_id")
      .filter(col("covered") =!= col("n_tok") ||
        col("f") =!= 0L || col("t") =!= col("n_tok")).count() == 0,
      "every doc must be tiled exactly by its segments")
    // every sequence except each language's last is exactly full —
    // the no-padding-waste property that distinguishes P6 from P3
    val perSeq = got.groupBy("lang", "seq_id").agg(sum("n_span").as("fill"))
    val lastSeq = perSeq.groupBy("lang").agg(max("seq_id").as("last"))
    assert(perSeq.join(lastSeq, "lang")
      .filter(col("seq_id") =!= col("last") && col("fill") =!= 512L).count() == 0,
      "every non-final sequence must hold exactly 512 tokens")
  }

  test("text_perplexity: surprisal stays in int64-exact bounds and every CCNet band is populated") {
    val got = run("text_perplexity").cache()
    // a bigram's surprisal is floor(log2(total/cf)) ∈ [0, 63] bits, so
    // the e4 mean must stay within those hard bounds
    assert(got.filter(col("ppx_e4") < 0L || col("ppx_e4") > 630000L).count() == 0,
      "mean surprisal outside the attainable [0, 63]-bit range")
    val bands = got.select("band").distinct().collect().map(_.getString(0)).toSet
    assert(bands == Set("head", "middle", "tail"),
      s"thresholds must split the corpus into all three bands, got $bands")
  }

  test("vocab_bpe_pairs: dense ranks, non-increasing counts, true 2-char merge candidates") {
    val rows = run("vocab_bpe_pairs").orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L),
      "ranks must be dense 1..20")
    assert(rows.forall(_.getString(1).length == 2),
      "every merge candidate is an adjacent char pair")
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing with rank")
  }

  test("signal_throttle plans the custom sort-free TopKPerKey and caps every bucket") {
    val df = run("signal_throttle")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"throttle must use the heap operator:\n$plan")
    assert(!plan.contains("Sort "), s"throttle must stay sort-free:\n$plan")
    assert(df.groupBy("bucket_s").count().filter(col("count") > 10).count() == 0,
      "no bucket may emit more than throttleN signals")
  }

  test("dedup_substring on the corpus never exceeds doc length and flags rows at sf") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val got = run("dedup_substring")
    assert(got.join(docs, "doc_id")
      .filter(col("dup_tokens") > col("n_tok") ||
        col("max_span_tokens") > col("n_tok")).count() == 0)
  }
}
