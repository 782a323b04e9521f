package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 first wave (Q18 HAVING shape,
  * log-integrity audit, 3-step pathing, streaming candles, the k-NN
  * graph, the binary-dedup ledger, hapax profiling). */
class Round8Spec extends SparkSpec {

  test("q18_having: exactly the HAVING-qualified orders, sums recomputed independently") {
    val got = run("q18_having").cache()
    got.collect().foreach { r =>
      assert(r.getAs[Long]("sum_qty_c") > 25000L, "sub-threshold order leaked")
    }
    // independent recount straight off the fact table
    val li = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_quantity*100,0) as bigint)")).as("q"))
      .filter(col("q") > 25000L)
    assert(got.count() == li.count(), "qualifying-order count mismatch")
    val joined = got.join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("sum_qty_c") =!= col("q")).count()
    assert(joined == 0L, "reported quantity sum differs from a direct recount")
  }

  test("es_offset_audit: the generated log is gap-free and duplicate-free, buckets tile it") {
    val a = run("es_offset_audit").cache()
    a.collect().foreach { r =>
      assert(r.getAs[Long]("n_missing") == 0L, s"bucket ${r.getAs[Long]("bucket")} reports gaps in a dense log")
      assert(r.getAs[Long]("n_dups") == 0L, s"bucket ${r.getAs[Long]("bucket")} reports dups in a unique log")
      assert(r.getAs[Long]("first_id") <= r.getAs[Long]("last_id"))
    }
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(a.agg(sum("n")).collect()(0).getLong(0) == total, "buckets must tile the log")
  }

  test("es_offset_audit: boundary gaps, duplicates, and entirely-missing buckets surface") {
    import spark.implicits._
    // bucket 0 observed from id 100 (clamped — complete), bucket 1
    // entirely missing, bucket 2 missing id 2500 and carrying 2600 twice
    val ids = (100L until 1024L) ++ ((2048L until 3072L).filter(_ != 2500L)) :+ 2600L
    val got = graft.operators.EventSourcing.auditOffsets(ids.toDF("event_id"))
      .collect().map(r => (r.getAs[Long]("bucket"),
        (r.getAs[Long]("n"), r.getAs[Long]("n_missing"), r.getAs[Long]("n_dups")))).toMap
    assert(got.keySet == Set(0L, 1L, 2L), s"bucket grid wrong: ${got.keySet}")
    assert(got(0L) == ((924L, 0L, 0L)), s"clamped head bucket: ${got(0L)}")
    assert(got(1L) == ((0L, 1024L, 0L)), s"missing bucket invisible: ${got(1L)}")
    assert(got(2L) == ((1024L, 1L, 1L)), s"interior gap+dup: ${got(2L)}")
  }

  test("behavior_pathing: path mass equals sum over users of (events - 2)") {
    val p = run("behavior_pathing").cache()
    // each user with n >= 3 events contributes exactly n - 2 trigrams
    val expected = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2, lit(0L))).as("m"))
      .collect()(0).getLong(0)
    assert(p.agg(sum("n_paths")).collect()(0).getLong(0) == expected)
    p.collect().foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_paths"))
      assert(r.getAs[Long]("n_users") >= 1L)
    }
  }

  test("stream_downsample: streamed candles equal the batch roll-up exactly") {
    val streamed = run("stream_downsample")
    val batch = run("metric_downsample")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed complete-mode candle diverges from the batch candle")
  }

  test("knn_graph: top-3 within bucket, ranked by the exact-arithmetic cosine") {
    val g = run("knn_graph").cache()
    // per-vector degree <= 3 and ranks are 1..deg
    val bad = g.groupBy("vec_id")
      .agg(count(lit(1)).as("deg"), max("rn").as("mx"), min("rn").as("mn"))
      .filter(col("deg") > 3 || col("mx") =!= col("deg") || col("mn") =!= 1L)
      .count()
    assert(bad == 0L, "degree/rank structure broken")
    // edges connect same-bucket vectors only, and the neighbor really is
    // among the top-3 cosines of that bucket (spot-check via recompute)
    val q = graft.functions.Similarity.quantized(spark, sf)
      .withColumn("bucket", graft.functions.Similarity.lshBucket(col("v")).cast("int"))
      .select("vec_id", "bucket")
    val cross = g.join(q, Seq("vec_id"))
      .join(q.select(col("vec_id").as("nbr_id"), col("bucket").as("nb")), Seq("nbr_id"))
      .filter(col("bucket") =!= col("nb")).count()
    assert(cross == 0L, "edge crosses LSH buckets")
    // ranking sanity: within a vec, cos_sim is non-increasing in rn
    val incoherent = g.alias("x").join(g.alias("y"),
        col("x.vec_id") === col("y.vec_id") && (col("x.rn") < col("y.rn")))
      .filter(col("x.cos_sim") < col("y.cos_sim")).count()
    assert(incoherent == 0L, "cos_sim increases with rank")
  }

  test("knn_recall: bounded, consistent, and monotone non-increasing in the plane count") {
    val r = run("knn_recall").collect()
    assert(r.length == 1)
    val row = r(0)
    val (nq, nt, nh) = (row.getAs[Long]("n_queries"), row.getAs[Long]("n_true"),
      row.getAs[Long]("n_hit"))
    assert(nq >= 1L, "md5 sample selected no query vectors")
    assert(nt == 3L * nq, "each sampled vector must contribute exactly its exact top-3")
    assert(nh <= nt && nh >= 0L)
    assert(row.getAs[Long]("recall_e4") == 10000L * nh / nt)
    // band-0 plane families are nested prefixes: more planes => finer
    // buckets => candidate SUBSETS => recall can only fall
    val byPlanes = Seq(4, 8, 12).map { p =>
      graft.functions.Similarity.knnRecallWith(spark, sf, p)
        .collect()(0).getAs[Long]("recall_e4")
    }
    assert(byPlanes(0) >= byPlanes(1) && byPlanes(1) >= byPlanes(2),
      s"recall not monotone in planes: $byPlanes")
    assert(byPlanes(1) == row.getAs[Long]("recall_e4"),
      "the op must equal the 8-plane point of the sweep")
  }

  test("mm_dedup: ledger reconciles with the document table") {
    val led = run("mm_dedup").cache()
    val totalDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(led.agg(sum("n_payloads")).collect()(0).getLong(0) == totalDocs)
    led.collect().foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_payloads"))
      assert(r.getAs[Long]("n_dup_copies") ==
        r.getAs[Long]("n_payloads") - r.getAs[Long]("n_unique"))
      assert(r.getAs[Long]("reclaimable_bytes") <= r.getAs[Long]("total_bytes"))
      assert(r.getAs[Long]("reclaimable_bytes") >= 0L)
    }
  }

  test("text_hapax: vocabulary agrees with corpus_stats; shares bound each other") {
    val h = run("text_hapax").cache()
    val cs = run("corpus_stats").select(col("lang"), col("n_vocab").as("cs_vocab"))
    val mism = h.join(cs, "lang")
      .filter(col("n_vocab") =!= col("cs_vocab")).count()
    assert(mism == 0L, "per-lang vocabulary differs from corpus_stats under the same tokenization")
    h.collect().foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_vocab"))
      // tokens >= vocab, so the mass share cannot exceed the vocab share
      assert(r.getAs[Long]("hapax_mass_e4") <= r.getAs[Long]("hapax_vocab_e4"))
    }
  }
}
