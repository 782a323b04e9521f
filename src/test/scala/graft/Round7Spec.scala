package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semantic invariants of the round-7 operators (each also has a full
  * DuckDB oracle entry; these pin the properties a hash-compare alone
  * wouldn't explain if broken). */
class Round7Spec extends SparkSpec {

  test("signal_gaps: gap stats replay from a driver-side walk of the raw log") {
    val got = run("signal_gaps").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("max_gap_us"), r.getAs[Long]("n_sla_gaps")))
      .toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = raw.groupBy(_._1).map { case (u, evs) =>
      val us = evs.map(_._2).sorted
      val gaps = us.iterator.zip(us.iterator.drop(1)).map { case (a, b) => b - a }.toSeq
      u -> ((us.size.toLong,
        if (gaps.isEmpty) 0L else gaps.max,
        gaps.count(_ >= 3600000000L).toLong))
    }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("behavior_cohort: ages are non-negative and cohort totals cover every user once at age 0") {
    val df = run("behavior_cohort").cache()
    assert(df.filter(col("age_d") < 0).isEmpty, "a user cannot be active before first seen")
    // every user is active on their own cohort day, so the age-0 rows
    // across cohorts tile the full user set exactly once
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val age0 = df.filter(col("age_d") === 0)
      .agg(sum(col("n_users"))).collect()(0).getLong(0)
    assert(age0 == users, s"age-0 cohort rows cover $age0 of $users users")
  }

  test("grouping_sets: subtotal levels are consistent projections of the finest level") {
    val df = run("grouping_sets").cache()
    val fine = df.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull)
    val byLs = df.filter(col("l_returnflag").isNull && col("l_linestatus").isNotNull)
    val grand = df.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(grand.count() == 1)
    val fineTotal = fine.agg(sum("sum_qty_c"), sum("n")).collect()(0)
    val lsTotal = byLs.agg(sum("sum_qty_c"), sum("n")).collect()(0)
    val g = grand.select("sum_qty_c", "n").collect()(0)
    assert(fineTotal.getLong(0) == g.getLong(0) && fineTotal.getLong(1) == g.getLong(1))
    assert(lsTotal.getLong(0) == g.getLong(0) && lsTotal.getLong(1) == g.getLong(1))
    // one Expand + hash-agg, no sort-based fallback
    val plan = run("grouping_sets").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets should plan through Expand")
    assert(!plan.contains("SortAggregate"), "grouping-set agg must stay hash-based")
  }

  test("corpus_token_budget: kept set is the quality-prefix and respects the budget") {
    val df = run("corpus_token_budget").cache()
    assert(df.count() == Tables.documents(spark, sf).count(), "one verdict row per doc")
    // within each language, the kept set is a PREFIX of the
    // (quality desc, doc_id) order: no rejected doc sorts before a kept one
    val rows = df.collect().map(r => (r.getAs[String]("lang"),
      100L - r.getAs[Long]("div_e2"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tok"), r.getAs[Long]("before"), r.getAs[Boolean]("kept")))
    rows.groupBy(_._1).values.foreach { docs =>
      val ordered = docs.sortBy(t => (t._2, t._3))
      val firstDrop = ordered.indexWhere(!_._6)
      if (firstDrop >= 0)
        assert(ordered.drop(firstDrop).forall(!_._6),
          "kept docs must form a prefix of the quality order")
      // the exclusive running sum reconstructs exactly
      var acc = 0L
      ordered.foreach { t =>
        assert(t._5 == acc, s"before mismatch for doc ${t._3}: ${t._5} != $acc")
        assert(t._6 == (acc < 2000L))
        acc += t._4
      }
    }
  }

  test("ann_recall: recall is bounded, exact, and consistent with its inputs") {
    val df = run("ann_recall").cache()
    assert(df.count() == 5, "one row per query vector")
    df.collect().foreach { r =>
      val (nTrue, nHit, rec) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("recall_e4"))
      assert(nTrue == 5L)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(rec == (10000L * nHit) / nTrue)
    }
    // the IVF probe reads 1 of 16 cells, so perfect recall everywhere
    // would be suspicious; zero everywhere would mean a broken join.
    val total = df.agg(sum("n_hit")).collect()(0).getLong(0)
    assert(total > 0L, "ANN should recover at least one true neighbor")
  }

  test("text_ngram_novelty: doc 0 pins 100% novelty and shares are exact") {
    val df = run("text_ngram_novelty").cache()
    // the lowest doc_id owns every one of its shingles by definition
    val minDoc = df.agg(min("doc_id")).collect()(0).getLong(0)
    val first = df.filter(col("doc_id") === minDoc).collect()(0)
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_shingles"))
    assert(first.getAs[Long]("novelty_e4") == 10000L)
    df.collect().foreach { r =>
      val (n, nov, e4) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
        r.getAs[Long]("novelty_e4"))
      assert(nov >= 0L && nov <= n)
      assert(e4 == 10000L * nov / n)
    }
    // novelty must actually discriminate: the corpus has repeated
    // boilerplate from sf0.001 up, so some doc scores below 100%
    assert(df.filter(col("novelty_e4") < 10000L).count() > 0L)
  }
}
