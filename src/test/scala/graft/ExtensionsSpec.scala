package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** The SQL surface of custom expressions. */
class ExtensionsSpec extends SparkSpec {
  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select(Similarity.quantize(col("embedding")).as("v"))
      .limit(50)
      .withColumn("sql_dot", expr("graft_dot(v, v)"))
      .withColumn("api_dot", Similarity.dot(col("v"), col("v")))
    assert(df.filter(col("sql_dot") =!= col("api_dot")).count() == 0)
  }

  test("full vector kernel surface is SQL-callable and matches the API") {
    GraftExtensions.register(spark)
    val df = Tables.embeddings(spark, sf).limit(50)
      .select(expr("graft_quantize(embedding)").as("v"),
        Similarity.quantize(col("embedding")).as("api_v"))
      .withColumn("sql_norm", expr("graft_sqnorm(v)"))
      .withColumn("api_norm", Similarity.sqNorm(col("api_v")))
      .withColumn("sql_bucket", expr("graft_lsh_bucket(v)"))
      .withColumn("api_bucket", Similarity.lshBucket(col("api_v")))
      .withColumn("sql_cos", expr("graft_cosine(v, v)"))
    assert(df.filter(col("v") =!= col("api_v")).count() == 0)
    assert(df.filter(col("sql_norm") =!= col("api_norm")).count() == 0)
    assert(df.filter(col("sql_bucket") =!= col("api_bucket")).count() == 0)
    // cos(v, v) = 1 exactly (integer dot over √(nn·nn))
    assert(df.filter(abs(col("sql_cos") - 1.0) > 1e-12).count() == 0)
  }

  test("register injects the sort-free top-k strategy") {
    GraftExtensions.register(spark)
    assert(spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
  }
}
