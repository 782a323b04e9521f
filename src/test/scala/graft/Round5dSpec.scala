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
