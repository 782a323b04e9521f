package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Similarity

/** C5: partitioned layout for co-located reads, plus the custom
  * codegen kernel's equivalence with its compositional form. */
class PartitionedWriteSpec extends SparkSpec {

  test("partitionBy(event_type) write prunes partitions on filtered read") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val all = spark.read.parquet(dir)
    val one = all.filter(col("event_type") === "purchase")
    // partition pruning: the event_type predicate must land in the
    // scan's PartitionFilters (directory-level pruning), not a row filter
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type") ||
      plan.contains("PartitionFilters: [(event_type"))
    // and reading only the pruned subdirectory yields the same rows
    val sub = spark.read.parquet(s"$dir/event_type=purchase")
    assert(sub.count() == one.count())
    assert(one.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("LongDotProduct equals the compositional aggregate(zip_with) form") {
    val df = Tables.embeddings(spark, sf)
      .select(Similarity.quantize(col("embedding")).as("v"))
      .limit(200)
      .withColumn("dot_fast", Similarity.dot(col("v"), col("v")))
      .withColumn("dot_ref",
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0L), (a, x) => a + x))
    assert(df.filter(col("dot_fast") =!= col("dot_ref")).count() == 0)
    assert(df.filter(col("dot_fast") <= 0).count() == 0)
  }
}
