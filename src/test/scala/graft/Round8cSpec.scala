package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 third wave (Q16 distinct-agg,
  * retention sweep, lang-id confusion grid). */
class Round8cSpec extends SparkSpec {

  test("q16_distinct_agg: counts bounded, grid tiles the part-link universe") {
    val g = run("q16_distinct_agg").cache()
    val nSupp = graft.sources.Tables.supplier(spark, sf).count()
    g.collect().foreach { r =>
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1L && c <= nSupp)
    }
    // every (brand, type, size) with at least one non-excluded lineitem
    // appears exactly once
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.supplier(spark, sf)
          .filter(col("s_acctbal") < 0).select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(graft.sources.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_type", "p_size").distinct().count()
    assert(g.count() == expected)
  }

  test("es_retention_policy: expiry bounded, long-TTL types never expire on a 30-day log") {
    val r = run("es_retention_policy").cache()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(r.agg(sum("n_events")).collect()(0).getLong(0) == total,
      "(type, shard) cells must tile the log")
    r.collect().foreach { row =>
      val (n, e) = (row.getAs[Long]("n_events"), row.getAs[Long]("n_expired"))
      assert(e >= 0L && e <= n)
      assert(row.getAs[Long]("expired_e4") == 10000L * e / n)
      if (Seq("signup", "purchase").contains(row.getAs[String]("event_type")))
        assert(e == 0L, "90-day TTL cannot expire anything on a 30-day log")
    }
    // the 7-day TTL must be expiring real volume on a 30-day log
    val err = r.filter(col("event_type") === "error")
      .agg(sum("n_expired")).collect()(0).getLong(0)
    assert(err > 0L)
  }

  test("text_lang_confusion: grid mass tiles the corpus, shares are per-label exact") {
    val c = run("text_lang_confusion").cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(c.agg(sum("n")).collect()(0).getLong(0) == docs.count())
    val perLang = docs.groupBy("lang").agg(count(lit(1)).as("expected"))
    val bad = c.groupBy("lang").agg(sum("n").as("got"))
      .join(perLang, "lang").filter(col("got") =!= col("expected")).count()
    assert(bad == 0L)
    // every pred is one of T1's marker groups
    val preds = c.select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds.forall(_.startsWith("g_")))
  }
}
