package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the late-round-5 operators (each also has a
  * full DuckDB oracle entry; these pin the properties a hash-compare
  * alone wouldn't explain if broken). */
class Round5bSpec extends SparkSpec {

  test("stream_join: every pair is same-user, view precedes purchase within 15 min") {
    val rows = run("stream_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_us")
      assert(lag >= 0L && lag <= 15L * 60 * 1000000,
        s"pair ${r} outside the interval")
    }
  }

  test("session_attribution: revenue only in converted sessions; entry always decoded") {
    val df = run("session_attribution").cache()
    assert(df.filter(col("entry_type").isNull).isEmpty,
      "every session's entry event type must decode")
    assert(df.filter(!col("converted") && col("revenue_c") =!= 0L).isEmpty,
      "non-converted sessions cannot carry revenue")
    assert(df.filter(col("converted")).count() > 0)
    // sessions tile the event log: per-session counts sum to the log size
    val total = df.agg(sum(col("n"))).head.getLong(0)
    val logN = graft.sources.Tables.events(spark, sf).count()
    assert(total == logN, s"session rows cover $total of $logN events")
  }

  test("vocab_bpe_merge: iteration 2 counts the merged symbol, not the consumed pair") {
    val it1 = run("vocab_bpe_pairs").collect()
    val winner = it1.minBy(r => (-r.getAs[Long]("n"), r.getAs[String]("pair")))
      .getAs[String]("pair")
    val asSymbols = winner.substring(0, 1) + " " + winner.substring(1, 2)
    val it2 = run("vocab_bpe_merge").collect()
    // the consumed char pair can no longer appear as adjacent symbols
    assert(!it2.exists(_.getAs[String]("pair") == asSymbols),
      s"winner '$asSymbols' must be merged away in iteration 2")
    // and the merged symbol participates in at least one new pair
    assert(it2.exists(_.getAs[String]("pair").split(" ").contains(winner)),
      s"merged symbol '$winner' should appear in iteration-2 pairs")
  }

  test("stream_session: complete-mode sessions equal the batch gaps-and-islands result") {
    val streamed = run("stream_session").collect().map(_.toSeq).toSet
    val batch = run("win_session").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "cross-batch session merge must reproduce the batch session set")
  }

  test("corpus_manifest: shard accounting ties out against the raw corpus") {
    import spark.implicits._
    val m = run("corpus_manifest").cache()
    m.collect().foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
      assert(r.getAs[String]("content_sha").length == 32)
    }
    // per-language token mass is partitioned exactly across shards
    val perLang = m.groupBy("lang").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("t")).toMap
    val raw = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("t")).toMap
    assert(perLang == raw, "shard token sums must tile the corpus exactly")
  }

  test("dedup_containment: thresholded, directional, and bounded by set sizes") {
    val rows = run("dedup_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ca = r.getAs[Long]("cont_a_e4"); val cb = r.getAs[Long]("cont_b_e4")
      assert(math.max(ca, cb) >= 8000L)
      assert(ca <= 10000L && cb <= 10000L, "containment cannot exceed 1")
      assert(r.getAs[Long]("inter_n") <= math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")))
      val dir = r.getAs[String]("contained")
      assert(if (ca >= cb) dir == "a_in_b" else dir == "b_in_a")
    }
  }
}
