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
}
