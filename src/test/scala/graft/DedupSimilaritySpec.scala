package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** LSH recall, Jaccard sanity, and similarity-search invariants. */
class DedupSimilaritySpec extends SparkSpec {

  /** Exact 3-word-shingle Jaccard for every pair sharing ≥1 shingle. */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").sliding(3).map(_.mkString(" ")).toSet)
    (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size if inter > 0
    } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("minhash-LSH candidates achieve full recall at jaccard >= 0.9") {
    val cands = run("dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearDups = exactJaccard.filter(_._2 >= 0.9).keySet
    assert(nearDups.nonEmpty, "test corpus should contain planted near-dups")
    val missed = nearDups -- cands
    assert(missed.isEmpty, s"LSH missed near-dup pairs: $missed")
  }

  test("ngram_jaccard matches exact recomputation") {
    run("ngram_jaccard").collect().foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(math.abs(j - exactJaccard.getOrElse(key, 0.0)) < 1e-12)
    }
  }

  test("dedup_exact keeps one canonical row per distinct text") {
    val total = Tables.documents(spark, sf).count()
    val out = run("dedup_exact")
    assert(out.agg(sum("n_copies")).collect()(0).getLong(0) == total)
  }

  test("cosine_topk ranks by descending similarity with vec_id tie-break") {
    val rows = run("cosine_topk")
      .orderBy("q_id", "rn").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Double]("cos_sim"), r.getAs[Long]("rn")))
    rows.grouped(10).foreach { g =>
      assert(g.map(_._3).toSeq == (1L to g.length))
      assert(g.sliding(2).forall { case Array(x, y) => x._2 >= y._2; case _ => true })
    }
    assert(rows.forall(r => r._2 <= 1.0 + 1e-9 && r._2 >= -1.0 - 1e-9))
  }

  test("ann_lsh neighbors are a subset of same-bucket corpus ranked like brute force") {
    val brute = run("cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos_sim"))
      .toMap
    // every ANN hit's cosine must equal the brute-force cosine when the
    // pair appears there (identical quantized arithmetic)
    run("ann_lsh").collect().foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      brute.get(k).foreach(c => assert(c == r.getAs[Double]("cos_sim")))
    }
  }

  test("dedup_embedding pairs collide in some LSH band and are above threshold") {
    import graft.functions.Dedup
    val q = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
    val buckets = (0 until Dedup.embBands).map { b =>
      q.select(col("vec_id"), Similarity.lshBucket(col("v"), Dedup.embPlanes, b).as("bk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val rows = run("dedup_embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(buckets.exists(m => m(a) == m(b)),
        s"pair ($a,$b) collides in no band")
      assert(r.getAs[Double]("cos_sim") >= 0.4)
    }
  }
}
