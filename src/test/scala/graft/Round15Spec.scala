package graft

import org.apache.spark.sql.functions._

/** Round-15 additions: the P25→D22→strip loop closed (P26
  * corpus_strip with its token-conservation law), the S15 envelope
  * composed into a real two-tier ANN (S16 rank-in-16 / re-score-in-64
  * with S17's fixed-budget recall eval), and the r12-advice plan fixes
  * (no redundant tail chunks, exact compact_out_files, decimal(38,0)
  * chunk canon keys).
  */
class Round15Spec extends SparkSpec {

  // ---- P26 corpus_strip ----

  test("corpus_strip conserves tokens and rewrites exactly the dup windows") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("corpus_strip").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    // total function of the corpus: one ledger row per document
    assert(got.keySet == docs.keySet)
    // plain-Scala replay of the whole strip pass
    val chunks = run("corpus_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byH = chunks.groupBy(_._5).filter(_._2.length >= 2)
    assert(byH.nonEmpty, "fixture has no shared windows — vacuous test")
    val canon = byH.map { case (h, occ) =>
      h -> occ.map(o => (o._1, o._2)).min
    }
    val dropPos: Map[Long, Set[Long]] = chunks
      .filter(c => byH.contains(c._5) && canon(c._5) != ((c._1, c._2)))
      .groupBy(_._1)
      .map { case (id, occ) =>
        id -> occ.flatMap(c => c._3 until (c._3 + c._4)).toSet
      }
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var stripped = 0
    for ((id, text) <- docs) {
      val toks = text.split(" ", -1)
      val dp = dropPos.getOrElse(id, Set.empty)
      val (orig, dropped, kept, h) = got(id)
      // the conservation law: every token is kept xor dropped
      assert(orig == toks.length.toLong)
      assert(dropped == dp.size.toLong)
      assert(kept + dropped == orig, s"doc $id leaks tokens")
      val expect = toks.zipWithIndex.collect {
        case (t, i) if !dp.contains(i.toLong) => t
      }.mkString(" ")
      assert(h == md5(expect), s"doc $id cleaned text diverges from replay")
      if (dp.nonEmpty) stripped += 1
    }
    assert(stripped > 0, "no document was actually stripped — vacuous")
    // canonical survival: a doc that is the canonical occurrence of
    // every shared window it contains loses nothing
    val allCanonDocs = docs.keySet.filter { id =>
      val mine = chunks.filter(c => c._1 == id && byH.contains(c._5))
      mine.nonEmpty && mine.forall(c => canon(c._5) == ((c._1, c._2)))
    }
    for (id <- allCanonDocs)
      assert(got(id)._2 == 0L, s"all-canonical doc $id was stripped")
  }

  // ---- R32 C9 bucketed dimension (r12 verdict item 1) ----

  test("R32's per-batch join shape: bucketed dim scan, zero exchange + zero sort on the dim side") {
    import graft.sources.Tables
    val tag = math.abs(scala.util.Random.nextLong() % 1000000L)
    val dim = s"r15_dim_$tag"
    val loc = s"/tmp/graft_r15_dim_$tag"
    Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
      .repartition(16, col("o_orderkey"))
      .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .option("path", loc).mode("overwrite").saveAsTable(dim)
    try {
      // force the at-scale (non-broadcast) shape the sf100 fix targets;
      // the legacy flag restores sorted-bucket ordering REPORTING
      // (SPARK-28632 turned it off by default) — Spark still verifies
      // one file per bucket before claiming order
      Tables.withScopedConf(spark,
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
      Tables.withScopedConf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1") {
        val fact = Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_returnflag", "l_extendedprice")
        val df = graft.operators.Relational.viewAgg(fact, spark.table(dim))
        val plan = df.queryExecution.executedPlan.toString
        // the dimension arrives pre-clustered from its buckets…
        assert(plan.contains("SelectedBucketsCount"),
          s"dim scan is not bucketed:\n$plan")
        // …so the only hash exchanges are the fact side into the join
        // and the post-join aggregate — the unbucketed form has 3
        val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(ex == 2, s"expected 2 exchanges (fact + agg), got $ex:\n$plan")
        // …and bucket-SORTED (one file per bucket) means the dim side
        // needs no sort under the SMJ; only the fact side sorts
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Sort [o_orderkey"),
          s"dim side re-sorted — bucket ordering was lost:\n$plan")
        // and the joined result is the same frame the unbucketed join
        // produces (the layout is invisible to the algebra)
        val viaTable = df.collect().map(_.toSeq).toSet
        val plain = graft.operators.Relational
          .viewAgg(fact, Tables.orders(spark, sf)
            .select("o_orderkey", "o_orderdate"))
          .collect().map(_.toSeq).toSet
        assert(viaTable == plain)
      }
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $dim")
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rec)); f.delete(); ()
      }
      rec(new java.io.File(loc))
    }
  }

  // ---- S16/S17 two-tier ANN ----

  test("ann_two_tier == brute force restricted to the tier-1 candidate set") {
    import graft.functions.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(x =>
          BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val signs = Array.tabulate(16, 64)((j, i) => Similarity.rpSign(i, j))
    def proj(v: Array[Long]): Array[Long] = signs.map(s => dot(v, s))
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / math.sqrt((dot(a, a) * dot(b, b)).toDouble)
    val queries = emb.filter(_._1 < 5)
    val corpus = emb.filter(_._1 >= 5)
    val expected = queries.flatMap { case (q, qv) =>
      val qp = proj(qv)
      val cand = corpus.toSeq
        .map { case (c, cv) => (c, cos(qp, proj(cv))) }
        .sortBy { case (c, s) => (-s, c) }.take(50).map(_._1)
      cand.map { c => (q, c, cos(qv, emb(c))) }
        .sortBy { case (_, c, s) => (-s, c) }.take(10).zipWithIndex
        .map { case ((_, c, s), i) => (q, c) -> (s, i + 1L) }
    }.toMap
    val got = run("ann_two_tier").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet, "candidate/top-k sets diverge from replay")
    for ((k, (s, rn)) <- expected) {
      assert(got(k)._2 == rn, s"$k rank")
      assert(math.abs(got(k)._1 - s) < 1e-12, s"$k score")
    }
  }

  test("ann_two_tier_recall measures the budgeted pre-filter against S1's truth") {
    val truth = run("cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tt = run("ann_two_tier").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = run("ann_two_tier_recall").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == truth.map(_._1))
    for ((q, (nTrue, nHit, e4)) <- rows) {
      assert(nTrue == truth.count(_._1 == q).toLong)
      assert(nHit == truth.count(t => t._1 == q && tt.contains(t)).toLong)
      assert(e4 == 10000L * nHit / nTrue)
      // the eval only means something if the pre-filter is actually
      // lossy OR perfect — both are valid; negative hits are not
      assert(nHit >= 0L && nHit <= nTrue)
    }
  }
}
