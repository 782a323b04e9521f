package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 seventh wave (eval-set builder,
  * idempotency-key dedup). */
class Round8gSpec extends SparkSpec {

  test("corpus_eval_holdout: exactly 20 per language, deterministic, a subset of the corpus") {
    val h = run("corpus_eval_holdout").cache()
    val perLang = h.groupBy("lang").agg(count(lit(1)).as("n")).collect()
    val langSizes = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("sz")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { r =>
      assert(r.getAs[Long]("n") == math.min(20L, langSizes(r.getAs[String]("lang"))))
    }
    // rerun freezes the identical set (pure function of the data)
    val again = run("corpus_eval_holdout")
    assert(h.exceptAll(again).isEmpty && again.exceptAll(h).isEmpty)
    // all members exist in the corpus
    val orphan = h.join(graft.sources.Tables.documents(spark, sf)
      .select("doc_id"), Seq("doc_id"), "left_anti").count()
    assert(orphan == 0L)
  }

  test("es_command_dedup: attempts tile the log, the winner is the key's first arrival") {
    val v = run("es_command_dedup").cache()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(v.agg(sum("n_attempts")).collect()(0).getLong(0) == total)
    v.collect().foreach { r =>
      assert(r.getAs[Long]("n_duplicates") == r.getAs[Long]("n_attempts") - 1)
      assert(r.getAs[Long]("n_duplicates") >= 0L)
    }
    // the accepted event really belongs to its (user, key) group and is
    // its earliest arrival — recheck via an independent window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "idem_key")
      .orderBy(graft.sources.Tables.microsOf(col("ts")), col("event_id"))
    val first = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("idem_key"),
        col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("idem_key"), col("event_id").as("expect"))
    val bad = v.join(first, Seq("user_id", "idem_key"))
      .filter(col("accepted_event_id") =!= col("expect")).count()
    assert(bad == 0L, "packed argmin disagrees with the window recompute")
  }
}
