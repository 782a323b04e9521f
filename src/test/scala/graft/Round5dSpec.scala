package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 tail operators (each also has a
  * full DuckDB oracle entry; these pin the properties a hash-compare
  * alone wouldn't explain if broken). */
class Round5dSpec extends SparkSpec {

  test("metric_anomaly: flagged readings are exactly the >3-sigma set") {
    val flagged = run("metric_anomaly").cache()
    assert(flagged.count() > 0, "synthetic log must contain 3-sigma outliers")
    // recompute the gate in floating point per sensor and check both
    // directions with a tolerance band around 3.0 (the integer-exact
    // op decides AT the boundary; FP recompute must agree off it)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mean"), stddev_pop("value").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val flaggedIds = flagged.collect().map(_.getAs[Long]("event_id")).toSet
    ev.collect().foreach { r =>
      val (mean, sd) = stats(r.getAs[String]("event_type"))
      val z = math.abs(r.getAs[Double]("value") - mean) / sd
      val hit = flaggedIds.contains(r.getAs[Long]("event_id"))
      if (z > 3.01) assert(hit, s"z=$z reading must be flagged: $r")
      if (z < 2.99) assert(!hit, s"z=$z reading must not be flagged: $r")
    }
  }

  test("text_bpe_encode: delimiter-replace equals a reference greedy BPE, exactly") {
    // the op's delimiter encoding assumes '#'/'~' never occur in text
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(!docs.exists { case (_, t) => t.contains('#') || t.contains('~') },
      "delimiter chars must not occur in the corpus")
    // independent reference implementation: learn 6 merges over the
    // word vocabulary, greedy-apply on symbol vectors (no string
    // replace tricks), count tokens per doc
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, t) =>
      t.split(" ").filter(_.nonEmpty).foreach(w => wf(w) += 1L)
    }
    var symsOf: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.split("").toVector).toMap
    for (_ <- 1 to 6) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- symsOf; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += wf(w)
      if (pc.nonEmpty) {
        val p = pc.toSeq.minBy { case ((a, b), n) => (-n, a + " " + b) }._1
        symsOf = symsOf.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
              out += (p._1 + p._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    val expect = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).map(w => symsOf(w).length.toLong).sum
    }.toMap
    val got = run("text_bpe_encode").cache()
    got.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("bpe_tokens") == expect(id),
        s"doc $id: op=${r.getAs[Long]("bpe_tokens")} reference=${expect(id)}")
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("bpe_tokens") <= r.getAs[Long]("n_chars"))
    }
    assert(got.count() == expect.size.toLong)
    // the 6 merges must actually compress: strictly fewer tokens than chars
    val tot = got.agg(sum("bpe_tokens"), sum("n_chars")).head
    assert(tot.getLong(0) < tot.getLong(1), "merges must reduce token count")
  }

  test("stream_anomaly: streamed verdicts equal the batch 3-sigma set") {
    val streamed = run("stream_anomaly").collect().map(_.toSeq).toSet
    val batch = run("metric_anomaly").collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "per-batch scoring against the broadcast baseline must union to the batch flag set")
  }

  test("corpus_funnel: monotone stages, exported row equals corpus_export") {
    val rows = run("corpus_funnel").collect()
      .map(r => r.getAs[Long]("stage_ord") ->
        (r.getAs[String]("stage"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    for (i <- 1L to 3L) {
      assert(rows(i)._2 >= rows(i + 1)._2, s"docs must not grow at stage ${i + 1}")
      assert(rows(i)._3 >= rows(i + 1)._3, s"tokens must not grow at stage ${i + 1}")
    }
    // the last stage IS the deliverable: doc and token counts must
    // equal the corpus_export result exactly
    val export = run("corpus_export").agg(
      count(lit(1)), sum(col("n_tok"))).head
    assert(rows(4L)._2 == export.getLong(0))
    assert(rows(4L)._3 == export.getLong(1))
    // every stage must actually gate something in the synthetic corpus
    assert(rows(1L)._2 > rows(2L)._2, "dedup must drop docs")
    assert(rows(4L)._2 > 0L)
  }

  test("embedding_qc: per-label stats bound each other and tile the corpus") {
    val qc = run("embedding_qc").collect()
    assert(qc.nonEmpty)
    var total = 0L
    qc.foreach { r =>
      val (n, deg) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_degenerate"))
      val (mn, mx, sm) =
        (r.getAs[Long]("min_n2"), r.getAs[Long]("max_n2"), r.getAs[Long]("sum_n2"))
      assert(n > 0L && deg >= 0L && deg <= n)
      assert(mn >= 0L && mn <= mx)
      assert(sm >= n * mn && sm <= n * mx, "sum must sit inside [n*min, n*max]")
      total += n
    }
    val all = graft.sources.Tables.embeddings(spark, sf).count()
    assert(total == all, s"labels must tile the corpus: $total of $all")
  }

  test("vocab_coverage: rates match a direct recompute and are non-trivial") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, t) => t.split(" ").filter(_.nonEmpty).foreach(w => freq(w) += 1L) }
    val top = freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(16).map(_._1).toSet
    val expect = docs.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
      lang -> ((toks.length.toLong, toks.count(top).toLong))
    }
    val got = run("vocab_coverage").collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, c) = expect(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("n_covered") == c)
      assert(r.getAs[Long]("coverage_e4") == c * 10000L / n)
      // K=16 of a 31-word bank: strictly partial coverage everywhere
      assert(c > 0L && c < n, "coverage must be non-trivial")
    }
  }

  test("es_reshard: mod-doubling splits every shard in two and tiles the log") {
    val plan = run("es_reshard").cache()
    val rows = plan.collect()
    rows.foreach { r =>
      val (o, n) = (r.getAs[Long]("old_shard"), r.getAs[Long]("new_shard"))
      assert(n == o || n == o + 16L, s"doubling must split in place: $r")
      assert(r.getAs[Boolean]("moves") == (n != o))
      assert(r.getAs[Long]("n_aggregates") > 0L)
    }
    // an old shard yields at most its two new halves (at the tiny spec
    // scale a shard's users can all land in one half), never a dup
    rows.groupBy(_.getAs[Long]("old_shard")).foreach { case (_, rs) =>
      assert(rs.length >= 1 && rs.length <= 2)
      assert(rs.map(_.getAs[Long]("new_shard")).distinct.length == rs.length)
    }
    // at sf0.001 every user_id < 16 ⇒ nothing moves; prove the plan
    // contains real migrations one scale up, where ids exceed 16
    val at01 = SparkEntry.queries("es_reshard")(spark, "/root/testdata/sf0.01")
    assert(at01.filter(col("moves")).count() > 0L,
      "the plan must contain actual migrations at sf0.01")
    // the plan tiles the log: event and aggregate counts sum to totals
    val ev = graft.sources.Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(rows.map(_.getAs[Long]("n_aggregates")).sum ==
      ev.select(countDistinct(col("user_id"))).head.getLong(0))
  }

  test("benchmark_leakage: every bench doc reported, stats self-consistent") {
    val rep = run("benchmark_leakage").collect()
    assert(rep.length == 20, "one row per benchmark doc, hits or not")
    rep.foreach { r =>
      val (h, mx, tot) = (r.getAs[Long]("n_docs_hit"),
        r.getAs[Long]("max_shared"), r.getAs[Long]("total_shared"))
      if (h == 0L) assert(mx == 0L && tot == 0L)
      else {
        assert(mx >= 5L, "a confirmed leak shares at least contamMin shingles")
        assert(tot >= h * 5L && mx <= tot)
      }
    }
    assert(rep.exists(_.getAs[Long]("n_docs_hit") > 0L),
      "the synthetic corpus plants real contamination")
  }

  test("decontaminate_report: fractions bounded, flag is the e4 rule, counts match P1") {
    val rep = run("decontaminate_report").cache()
    assert(rep.filter(col("overlap_e4") < 0L || col("overlap_e4") > 10000L).isEmpty,
      "overlap fraction must be a valid e4 proportion")
    assert(rep.filter(col("n_shared") > col("n_shingles")).isEmpty,
      "shared shingles are a subset of the doc's shingles")
    assert(rep.filter(col("contaminated") =!= (col("overlap_e4") >= 500L)).isEmpty,
      "flag must be exactly the 5% rule")
    assert(rep.filter(col("contaminated")).count() > 0)
    assert(rep.filter(!col("contaminated")).count() > 0)
    // the numerator is P1's shared-shingle count, doc for doc
    val p1 = run("decontaminate").select(col("doc_id"), col("n_shared").as("p1_shared"))
    assert(rep.join(p1, "doc_id").filter(col("n_shared") =!= col("p1_shared")).isEmpty,
      "report numerator must equal decontaminate's count")
    assert(rep.count() == p1.count(), "same doc universe as P1")
  }
}
