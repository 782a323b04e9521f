package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch attribution probe for corpus_compaction_exec's warm rep:
  * times the FS census, the partitioned read-back (discovery + scan),
  * the md5 fingerprint agg, and the full op, separately.
  * Usage: runMain graft.tools.CompactProbe <sfDir> [reps] */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    // build the capital once (timed separately)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[compact-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    t("full op (build+scan, rep1)") {
      graft.SparkEntry.queries("corpus_compaction_exec")(spark, sfDir).count()
    }
    val outDir = s"${graft.sources.Tables.workDir(spark)}/compact_exec_" +
      graft.sources.Tables.datasetTag(sfDir)
    (1 to reps).foreach { i =>
      t(s"census (hadoop ChecksumFS) rep$i") {
        val root = new org.apache.hadoop.fs.Path(outDir)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        val it = fs.listFiles(root, true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      t(s"census (listDataFiles) rep$i") {
        graft.sources.Tables.listDataFiles(spark, outDir).size
      }
      t(s"read-back count rep$i") {
        spark.read.parquet(outDir).count()
      }
      t(s"read-back md5 agg rep$i") {
        spark.read.parquet(outDir)
          .withColumn("env", concat_ws("|", col("doc_id"), col("lang"),
            col("source"), col("n_chars"), col("text")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("bit_xor(cast(conv(substring(md5(env), 1, 15), 16, 10) as bigint))")
              .as("doc_xor")).count()
      }
      t(s"full op rep$i") {
        graft.SparkEntry.queries("corpus_compaction_exec")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
