package graft

import org.apache.spark.sql.functions._

/** Reliable-checkpoint mode (round 9): `graft.checkpoint.reliable=true`
  * swaps every Tables.stableCheckpoint lineage cut from executor-held
  * localCheckpoint blocks to a parquet round-trip through workDir, so
  * an executor lost mid-computation costs a stage retry instead of a
  * possible irrecoverable missing-block failure (measured in the
  * standalone worker-kill campaign, SCALE.md §cluster). The mode must
  * be RESULT-INVISIBLE: same rows in both modes for the heaviest
  * stableCheckpoint consumer (the CC loop behind dedup_clusters) and
  * for a direct cut.
  */
class Round9cSpec extends SparkSpec {

  private def withReliable[T](body: => T): T = {
    spark.conf.set("graft.checkpoint.reliable", "true")
    try body
    finally spark.conf.unset("graft.checkpoint.reliable")
  }

  test("stableCheckpoint round-trips rows and schema exactly in reliable mode") {
    val df = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
    val cut = withReliable(graft.sources.Tables.stableCheckpoint(df))
    assert(cut.schema == df.schema)
    assert(cut.exceptAll(df).isEmpty && df.exceptAll(cut).isEmpty)
  }

  test("the CC closure is identical under reliable and default checkpointing") {
    val edges = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 97).as("g"))
      .alias("a")
      .join(graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), (col("doc_id") % 97).as("g")).alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // a sparse chain subset so components are non-trivial (not one
      // clique per residue): keep only consecutive-rank pairs
      .filter(col("doc_b") - col("doc_a") <= lit(200))
    val default_ = graft.functions.Clusters.components(edges)
      .orderBy("node").collect().toSeq
    val reliable = withReliable(
      graft.functions.Clusters.components(edges)
        .orderBy("node").collect().toSeq)
    assert(default_ == reliable)
    assert(default_.nonEmpty)
  }
}
