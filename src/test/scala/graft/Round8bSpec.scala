package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 second wave (semantic dedup
  * closure, signal co-occurrence, filtered ANN, the audit hash chain). */
class Round8bSpec extends SparkSpec {

  test("dedup_semantic: verdicts are consistent with the D5 pair graph") {
    val v = run("dedup_semantic").cache()
    // cluster label is the min member; keep iff canonical
    v.collect().foreach { r =>
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("vec_id"))
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("cluster_id") == r.getAs[Long]("vec_id")))
    }
    // every near-dup pair must land in one cluster
    val pairs = graft.functions.Dedup.dedupEmbeddingWith(spark, sf,
      graft.functions.Dedup.embPlanes, graft.functions.Dedup.embBands)
    val la = v.select(col("vec_id").as("vec_a"), col("cluster_id").as("ca"))
    val lb = v.select(col("vec_id").as("vec_b"), col("cluster_id").as("cb"))
    val split = pairs.join(la, "vec_a").join(lb, "vec_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split == 0L, s"$split near-dup pairs straddle clusters")
    // exactly one keeper per cluster
    val multi = v.filter(col("keep")).groupBy("cluster_id")
      .agg(count(lit(1)).as("k")).filter(col("k") =!= 1L).count()
    assert(multi == 0L)
  }

  test("signal_correlation: co-occurrence bounded by both marginals, jaccard exact") {
    val c = run("signal_correlation").cache()
    c.collect().foreach { r =>
      val (co, na, nb) = (r.getAs[Long]("n_cooccur"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(co >= 1L && co <= math.min(na, nb))
      assert(r.getAs[Long]("jaccard_e4") == 10000L * co / (na + nb - co))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"),
        "pair grid must be upper-triangular")
    }
  }

  test("ann_filtered: neighbors carry the query's label and rank correctly") {
    val f = run("ann_filtered").cache()
    // neighbor labels are checked by construction (join key); verify the
    // degree structure and that results never include a query vector
    assert(f.filter(col("vec_id") < 5).count() == 0L)
    val deg = f.groupBy("q_id")
      .agg(count(lit(1)).as("deg"), max("rn").as("mx")).collect()
    deg.foreach { r =>
      assert(r.getAs[Long]("deg") <= 5L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("deg"))
    }
    // filtered top-1 cosine can never beat the UNfiltered top-1
    val unf = run("cosine_topk").filter(col("rn") === 1L)
      .select(col("q_id"), col("cos_sim").as("best"))
    val bad = f.filter(col("rn") === 1L).join(unf, "q_id")
      .filter(col("cos_sim") > col("best") + 1e-12).count()
    assert(bad == 0L, "filtered best exceeds the unfiltered best")
  }

  test("es_audit_chain: counts tile the log and the head is tamper-evident") {
    val ch = run("es_audit_chain").cache()
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val mism = ch.join(counts, "user_id")
      .filter(col("n_events") =!= col("n")).count()
    assert(mism == 0L, "chain length differs from the aggregate's event count")
    // tamper test: re-derive one aggregate's chain with one event
    // dropped — the head MUST change (that is the point of the chain)
    import spark.implicits._
    val uid = ch.select("user_id").as[Long].head()
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(graft.sources.Tables.microsOf(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long)].collect().sortBy(identity)
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def head(es: Seq[(Long, Long)]): String =
      es.foldLeft(md5Hex(s"seed:$uid")) { (c, e) => md5Hex(s"$c:${e._2}") }
    val full = head(evs.toSeq)
    val tampered = head(evs.toSeq.drop(1))
    assert(ch.filter(col("user_id") === uid).select("chain_head")
      .as[String].head() == full, "engine chain differs from a local replay")
    assert(full != tampered)
  }
}
