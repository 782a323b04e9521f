package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 fourth wave (live audit chain,
  * forecast eval, the data card). */
class Round8dSpec extends SparkSpec {

  test("stream_audit_chain: streamed heads equal the batch chain byte-for-byte") {
    val streamed = run("stream_audit_chain")
    val batch = run("es_audit_chain")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "live chain diverges from the offline sweep")
  }

  test("metric_forecast: error masses are consistent and the model window is honored") {
    val f = run("metric_forecast").cache()
    f.collect().foreach { r =>
      val (n, sae) = (r.getAs[Long]("n_test"), r.getAs[Long]("sae_c"))
      assert(n >= 1L && sae >= 0L)
      assert(r.getAs[Long]("mae_c") == sae / n)
      // |Σ signed| can never exceed Σ |·|
      assert(math.abs(r.getAs[Long]("bias_sum_c")) <= sae)
      assert(r.getAs[Long]("pred_c") > 0L, "cents readings are positive, so is their floor-mean")
    }
    // one cell recomputed independently
    val row = f.orderBy("event_type", "hour_of_day").collect()(0)
    val (et, hod) = (row.getAs[String]("event_type"), row.getAs[Long]("hour_of_day"))
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === et && hour(col("ts")) === hod)
      .select(expr("cast(round(value*100,0) as bigint)").as("c"), col("ts"))
    val tr = ev.filter(col("ts") < lit("2024-01-21 00:00:00").cast("timestamp"))
      .agg(sum("c").as("s"), count(lit(1)).as("n")).collect()(0)
    assert(row.getAs[Long]("pred_c") == tr.getAs[Long]("s") / tr.getAs[Long]("n"))
  }

  test("corpus_card: every stat matches a direct recount") {
    val card = run("corpus_card").collect()
      .map(r => r.getAs[String]("stat") -> r.getAs[Long]("value")).toMap
    val docs = graft.sources.Tables.documents(spark, sf).cache()
    assert(card("n_docs") == docs.count())
    assert(card("n_langs") == docs.select("lang").distinct().count())
    assert(card("n_sources") == docs.select("source").distinct().count())
    val dups = docs.count() - docs.select(md5(col("text"))).distinct().count()
    assert(card("n_exact_dup_docs") == dups)
    assert(card("mean_doc_tokens") == card("n_tokens") / card("n_docs"))
    assert(card("n_chars") >= card("n_tokens"), "chars include at least one per token")
  }
}
