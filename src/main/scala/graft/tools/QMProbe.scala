package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off value+timing probe for the in-scan quality scorer: prints
  * the checksum aggregate so the wall time can be cross-checked against
  * an independent DuckDB evaluation of the same integer arithmetic.
  * Usage: runMain graft.tools.QMProbe <dir> [cpus] */
object QMProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf100")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val row = graft.functions.TextAnalysis.qualityModelScored(spark, dir).head()
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[qmprobe] dir=$dir score_sum=${row.getLong(0)} n_keep=${row.getLong(1)} n_docs=${row.getLong(2)} wall=$s%.2f s")
    spark.stop()
  }
}
