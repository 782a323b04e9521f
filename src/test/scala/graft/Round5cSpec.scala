package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the final round-5 operators (each also has a
  * full DuckDB oracle entry; these pin the properties a hash-compare
  * alone wouldn't explain if broken). */
class Round5cSpec extends SparkSpec {

  test("corpus_interleave: pos is the exact permutation of the naive global sort") {
    val out = run("corpus_interleave").cache()
    val n = out.count()
    // pos is a permutation of 0..N-1 (no gap, no dup — the bucketed
    // exclusive scan must tile exactly)
    assert(out.agg(countDistinct(col("pos"))).head.getLong(0) == n)
    assert(out.agg(min(col("pos")), max(col("pos"))).head.toSeq == Seq(0L, n - 1))
    // and equals the single-reducer reference order it replaces
    val naive = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id")
      .select(col("doc_id"))
      .collect().map(_.getLong(0))
    val bucketed = out.orderBy("pos").select("doc_id").collect().map(_.getLong(0))
    assert(bucketed.sameElements(naive),
      "bucketed scan must reproduce the global (md5, doc_id) order")
  }

  test("metric_slo_burn: the page bit is exactly the two-window burn rule") {
    val rows = run("metric_slo_burn").cache()
    // the synthetic log must exercise BOTH outcomes or the op proves nothing
    assert(rows.filter(col("page")).count() > 0)
    assert(rows.filter(!col("page")).count() > 0)
    rows.collect().foreach { r =>
      val (ln, le) = (r.getAs[Long]("long_n"), r.getAs[Long]("long_err"))
      val (sn, se) = (r.getAs[Long]("short_n"), r.getAs[Long]("short_err"))
      assert(sn <= ln && se <= le, "short window is a subset of the long")
      assert(se <= sn && le <= ln, "errors bounded by counts")
      val expect = sn >= 1L && le * 10000L >= ln * 2000L && se * 10000L >= sn * 2000L
      assert(r.getAs[Boolean]("page") == expect, s"burn rule mismatch on $r")
    }
  }

  test("dedup_incremental: the delta probe equals the full recompute, index built once") {
    val t = graft.functions.Dedup.incThreshold(spark, sf)
    val inc = run("dedup_incremental").collect().map(_.toSeq).toSet
    assert(inc.nonEmpty)
    // every pair touches a new doc (pairs are doc_a < doc_b, new ids > T)
    inc.foreach { p => assert(p(1).asInstanceOf[Long] > t, s"old-only pair $p") }
    // the incremental path must EQUAL the full-corpus recompute
    // restricted to what a new batch can introduce
    val full = run("dedup_minhash_lsh")
      .filter(col("doc_b") > t).collect().map(_.toSeq).toSet
    assert(inc == full, "incremental probe diverges from the full recompute")
    // the old-corpus index is persisted once per (session, dataset):
    // a second invocation reuses the files instead of rewriting them
    val dir = new java.io.File(graft.sources.Tables.workDir(spark))
      .listFiles().filter(_.getName.startsWith("dedup_inc_idx_"))
    assert(dir.nonEmpty, "index directory must exist after the first run")
    val stamps = dir.head.listFiles().map(f => f.getName -> f.lastModified).toMap
    run("dedup_incremental").count()
    val after = dir.head.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == stamps, "second run must not rewrite the persisted index")
  }

  test("dedup_admit: one verdict per new doc, dup_of earlier and correctly ranked") {
    val t = graft.functions.Dedup.incThreshold(spark, sf)
    val admit = run("dedup_admit").cache()
    val newN = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") > t).count()
    assert(admit.count() == newN, "exactly one admission row per new doc")
    assert(admit.filter(col("verdict") === "keep" && col("dup_of").isNotNull).isEmpty)
    assert(admit.filter(col("verdict") =!= "keep" && col("dup_of").isNull).isEmpty)
    assert(admit.filter(col("dup_of") >= col("doc_id")).isEmpty,
      "the canonical duplicate must be the EARLIER doc")
    // exact_dup means byte-identical content with its dup_of
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val ex = admit.filter(col("verdict") === "exact_dup")
      .join(docs.select(col("doc_id"), col("h").as("h_new")), "doc_id")
      .join(docs.select(col("doc_id").as("dup_of"), col("h").as("h_old")), "dup_of")
    assert(ex.filter(col("h_new") =!= col("h_old")).isEmpty,
      "exact_dup verdicts must point at byte-identical content")
    // near_dup verdicts are backed by an incremental candidate pair
    val nearPairs = run("dedup_incremental")
      .select(col("doc_b").as("doc_id")).distinct()
    val orphan = admit.filter(col("verdict") === "near_dup")
      .join(nearPairs, Seq("doc_id"), "left_anti")
    assert(orphan.isEmpty, "near_dup verdicts must come from candidate pairs")
  }

  test("stream_admit: the live ingest gate equals batch admission; index grows to full coverage") {
    val streamed = run("stream_admit").collect().map(_.toSeq).toSet
    val batch = run("dedup_admit").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "micro-batched admission must reproduce the batch verdict set")
    // after the run, base index (immutable, built once per dataset) ∪
    // this invocation's growth deltas covers the WHOLE corpus
    val work = new java.io.File(graft.sources.Tables.workDir(spark))
    val base = work.listFiles()
      .filter(_.getName.startsWith("admit_base_bands_"))
    assert(base.nonEmpty, "base band index missing")
    val stores = work.listFiles().filter(_.getName.startsWith("admit_bands_"))
    assert(stores.nonEmpty)
    val latest = stores.maxBy(_.lastModified)
    // each graded batch lands under a committed delta_b<id> dir (the
    // idempotent-append layout) — list recursively
    val storeRows = spark.read.parquet(base.head.getPath).count() +
      spark.read.option("recursiveFileLookup", "true")
        .parquet(latest.getPath).count()
    val fullRows = graft.functions.Dedup
      .bandRows(graft.sources.Tables.documents(spark, sf)).count()
    assert(storeRows == fullRows,
      s"base+growth hold $storeRows band rows, full corpus has $fullRows")
    // idempotence: every batch landed as a committed delta dir; a
    // redelivery would find its dir and not double-append
    val deltas = Option(latest.listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("delta_b"))
    assert(deltas.length == graft.streaming.Streams.sourceBatches,
      s"expected one committed delta per micro-batch, got ${deltas.map(_.getName).toSeq}")
  }

  test("stream_slo_burn: the live paging view equals the batch audit") {
    val streamed = run("stream_slo_burn").collect().map(_.toSeq).toSet
    val batch = run("metric_slo_burn").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "complete-mode refresh must reproduce the batch burn-rate table")
  }
}
