package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 wave (multi-topic outbox
  * routing). */
class Round9Spec extends SparkSpec {

  test("es_outbox_routed: fan-out counts reconcile and the journal hash covers every event") {
    val m = run("es_outbox_routed").collect()
      .map(r => r.getAs[String]("topic") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("env_xor"))).toMap
    val ev = graft.sources.Tables.events(spark, sf).cache()
    val total = ev.count()
    val billing = ev.filter(col("event_type").isin("purchase", "signup")).count()
    val alerts = ev.filter(col("event_type") === "error").count()
    assert(m("journal")._1 == total, "journal topic must carry every event")
    assert(m.get("billing").map(_._1).getOrElse(0L) == billing)
    assert(m.get("alerts").map(_._1).getOrElse(0L) == alerts)
    // the journal hash equals an independent xor over freshly built
    // envelopes (never touching the partitioned write under test)
    val expected = ev.select(
        concat_ws("|", col("event_id"), col("user_id"), col("event_type"),
          expr("cast(round(value*100,0) as bigint)"),
          coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L)))
          .as("env"))
      .agg(expr("bit_xor(cast(conv(substring(md5(env), 1, 15), 16, 10) as bigint))"))
      .collect()(0).getLong(0)
    assert(m("journal")._2 == expected,
      "journal envelope hash diverges from a direct recompute")
    // the routed write really landed one directory per topic
    val dir = new java.io.File(
      s"${graft.sources.Tables.workDir(spark)}/outbox_routed")
    val topics = dir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("topic=")).toSet
    assert(topics == Set("topic=journal", "topic=billing", "topic=alerts"),
      s"partitioned layout wrong: $topics")
  }
}
