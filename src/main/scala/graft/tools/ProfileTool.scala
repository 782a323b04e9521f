package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs one named query N times in a
  * Bench-shaped session. Usage:
  * runMain graft.tools.ProfileTool <sfDir> <name> [reps] */
object ProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    (1 to reps).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
