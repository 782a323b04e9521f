package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-6 operators (each also has a full
  * DuckDB oracle entry; these pin the properties a hash-compare alone
  * wouldn't explain if broken). */
class Round6Spec extends SparkSpec {

  test("corpus_split: every doc in exactly one split; identical content never straddles splits") {
    val df = run("corpus_split").cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    assert(df.count() == nDocs, "one split row per document")
    assert(df.filter(!col("split").isin("train", "validation", "test")).isEmpty)
    // content-keyed: byte-identical docs always land in the SAME split —
    // the held-out-leakage mode row-id/random splits silently have
    val perContent = df
      .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
      .groupBy("h").agg(countDistinct(col("split")).as("ns"))
    assert(perContent.filter(col("ns") > 1).isEmpty,
      "identical content must never straddle splits")
    // the e4 hash gate yields the 90/5/5 shape within sampling noise
    val train = df.filter(col("split") === "train").count()
    assert(train > nDocs * 80L / 100L && train < nDocs * 97L / 100L,
      s"train split $train of $nDocs is outside the 90% +- noise band")
  }

  test("signal_debounce: greedy cooldown semantics, replayed independently") {
    val cool = 3600000000L // keep in sync with Windows.debounceCoolUs
    val emitted = run("signal_debounce").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id")))
    assert(emitted.nonEmpty)
    // no two emitted signals for one key within the cooldown
    emitted.groupBy(_._1).values.foreach { evs =>
      evs.map(_._2).sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1) - w(0) >= cool,
          s"emitted signals ${w(0)} and ${w(1)} violate the cooldown")
      }
    }
    // independent replay: a driver-side greedy walk over the raw log
    val raw = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).iterator.flatMap { case (u, evs) =>
      var last = Long.MinValue
      evs.sortBy(e => (e._2, e._3)).flatMap { case (_, us, eid) =>
        if (last == Long.MinValue || us >= last + cool) {
          last = us; Some((u, us, eid))
        } else None
      }
    }.toSet
    assert(emitted.map(e => (e._1, e._2, e._3)).toSet == expect)
  }

  test("dedup_stats: cluster sizes tile the corpus and agree with the cluster table") {
    val stats = run("dedup_stats").cache()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(stats.agg(sum(col("n_docs"))).head.getLong(0) == nDocs,
      "cluster sizes must cover every document exactly once")
    // excess copies = exactly the docs dedup_clusters drops
    val excess = stats.agg(sum(col("n_excess"))).head.getLong(0)
    val dropped = run("dedup_clusters").filter(!col("keep")).count()
    assert(excess == dropped,
      s"histogram claims $excess excess docs, cluster table drops $dropped")
  }

  test("behavior_transitions: transition mass = events minus one per user; shares floor-sum") {
    val df = run("behavior_transitions").cache()
    val ev = graft.sources.Tables.events(spark, sf)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(df.agg(sum(col("n"))).head.getLong(0) == want,
      "every event except each user's last contributes one transition")
    // integer-floor shares per from_type sum into (10000 - k, 10000]
    df.groupBy("from_type")
      .agg(sum(col("share_e4")).as("s"), count(lit(1)).as("k"))
      .collect().foreach { r =>
        val s = r.getAs[Long]("s"); val k = r.getAs[Long]("k")
        assert(s <= 10000L && s > 10000L - k, s"share sum $s over $k rows")
      }
  }

  test("es_lateness: bounded counts, reproduced by replaying the worst aggregate") {
    val df = run("es_lateness").cache()
    assert(df.filter(col("n_late") > col("n_events")).isEmpty)
    assert(df.filter(col("n_late") === 0L && col("max_late_us") =!= 0L).isEmpty,
      "a user with zero late events cannot carry nonzero lateness")
    val worst = df.orderBy(col("max_late_us").desc, col("user_id")).head
    val uid = worst.getAs[Long]("user_id")
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var hwm = Long.MinValue; var nLate = 0L; var maxLate = 0L
    evs.foreach { case (_, us) =>
      if (hwm != Long.MinValue && us < hwm) {
        nLate += 1; maxLate = math.max(maxLate, hwm - us)
      }
      hwm = math.max(hwm, us)
    }
    assert(nLate == worst.getAs[Long]("n_late"))
    assert(maxLate == worst.getAs[Long]("max_late_us"))
  }

  test("metric_heatmap: the grid tiles the log; streaming twin repaints it exactly") {
    val grid = run("metric_heatmap").cache()
    assert(grid.agg(sum(col("n"))).head.getLong(0) ==
      graft.sources.Tables.events(spark, sf).count(),
      "heatmap cells must tile the event log")
    assert(grid.filter(col("vband") < 0L || col("vband") > 9L).isEmpty)
    val streamed = run("stream_heatmap").collect().map(_.toSeq).toSet
    assert(streamed == grid.collect().map(_.toSeq).toSet,
      "complete-mode refresh must equal the batch grid")
  }

  test("source_quality: per-source counts reconcile with the corpus-wide gates") {
    val sq = run("source_quality").cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(sq.agg(sum(col("n_docs"))).head.getLong(0) == docs.count())
    val fails = run("corpus_filter").filter(!col("keep")).count()
    assert(sq.agg(sum(col("n_fail"))).head.getLong(0) == fails,
      "per-source failure counts must sum to the P5 gate's drop count")
    val dupDocs = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1L)
      .agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    assert(sq.agg(sum(col("n_dup"))).head.getLong(0) == dupDocs,
      "per-source dup counts must sum to the docs in >1-sized content groups")
  }

  test("text_keywords: <= 10 per language; the score is exactly the e4 tf/df ratio") {
    val kw = run("text_keywords").collect()
    assert(kw.nonEmpty)
    kw.groupBy(_.getAs[String]("lang")).values
      .foreach(rows => assert(rows.length <= 10))
    kw.foreach { r =>
      assert(r.getAs[Long]("score_e4") ==
        10000L * r.getAs[Long]("tf") / r.getAs[Long]("df"))
    }
  }
}
