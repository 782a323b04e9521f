package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** Pipeline capstones (decontaminate / corpus_export), vocab top-k via
  * the custom operator, repetition scoring, and the codegen LSH kernel. */
class PipelineSpec extends SparkSpec {

  test("LshBucket codegen kernel is bit-identical to the composed formula") {
    val df = Tables.embeddings(spark, sf)
      .select(Similarity.quantize(col("embedding")).as("v"))
      .withColumn("kernel", Similarity.lshBucket(col("v")))
      .withColumn("composed", Similarity.lshBucketComposed(col("v")))
    assert(df.count() > 0)
    assert(df.filter(col("kernel") =!= col("composed")).count() == 0)
    // 8 planes ⇒ bucket ids in [0, 256)
    assert(df.filter(col("kernel") < 0 || col("kernel") > 255).count() == 0)
  }

  test("vocab_topk equals the ranking-window formulation") {
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("letter", substring(col("token"), 1, 1))
      .withColumn("tid", expr("cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("letter").orderBy(col("freq").desc, col("tid"))
    val windowForm = freq.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("letter", "token", "freq")
    val custom = run("vocab_topk")
    assert(custom.except(windowForm).count() == 0)
    assert(windowForm.except(custom).count() == 0)
  }

  test("text_repetition ratios are in [0,1) and exact duplicates agree") {
    val rep = run("text_repetition").cache()
    assert(rep.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1).count() == 0)
    // identical texts must score identically
    val perText = Tables.documents(spark, sf)
      .join(rep, "doc_id")
      .groupBy("text").agg(countDistinct(col("dup_ratio")).as("nr"))
    assert(perText.filter(col("nr") > 1).count() == 0)
  }

  test("decontaminate covers exactly the corpus side, flags are threshold-consistent") {
    val dec = run("decontaminate").cache()
    val nCorpus = Tables.documents(spark, sf).filter(col("doc_id") >= 20).count()
    assert(dec.count() == nCorpus)
    assert(dec.filter(col("contaminated") =!= (col("n_shared") >= 5)).count() == 0)
  }

  test("corpus_export rows are kept, clean, long enough, one per cluster") {
    val export = run("corpus_export").cache()
    assert(export.count() > 0)
    assert(export.filter(col("n_tok") < 10).count() == 0)
    assert(export.filter(col("doc_id") < 20).count() == 0)
    // cluster ids are unique (one survivor per cluster) and = doc_id
    assert(export.filter(col("cluster_id") =!= col("doc_id")).count() == 0)
    // exported docs are a subset of the dedup keep set
    val keep = run("dedup_clusters").filter(col("keep")).select("doc_id")
    assert(export.select("doc_id").except(keep).count() == 0)
    // and none of them is contaminated
    val dirty = run("decontaminate").filter(col("contaminated")).select("doc_id")
    assert(export.select("doc_id").intersect(dirty).count() == 0)
  }
}
