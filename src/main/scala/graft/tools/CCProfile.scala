package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Clusters, Dedup, SimHash}

/** Phase timing for dedup_clusters. */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.lineitem(spark, sfDir).count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d2 = Dedup.candidatePairs(spark, sfDir).select("doc_a", "doc_b")
    time("d2 pairs")(println("  d2=" + d2.count()))
    val d4 = SimHash.simhashPairs(spark, sfDir).select("doc_a", "doc_b")
    time("d4 pairs")(println("  d4=" + d4.count()))
    val edges = d2.union(d4)
    val labels = time("components")(Clusters.components(edges))
    time("labels count")(println("  nodes=" + labels.count()))
    val out = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
    time("final join")(out.count())
    spark.stop()
  }
}
