package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED two-tier (S18 `ann_lsh_two_tier`) measured at native
  * dims and probe query counts, beside the flat tier and brute force.
  * The flat S16 loses to brute at 64-d (SCALE.md round 15: pair cost
  * is overhead-bound, not multiply-bound); the composition's claim is
  * different — the LSH bucket cuts the tier-1 CANDIDATE count ~256×
  * before any arithmetic runs — so it must win at 64-d where the flat
  * tier cannot, and this probe prices the recall that win costs
  * (bucket pruning + budget vs the brute truth).
  *
  * Usage: runMain graft.tools.BucketTwoTierProbe <srcDir> [outJson] [cpus]
  */
object BucketTwoTierProbe {

  private final class VolumeListener extends SparkListener {
    @volatile var shuffleWrite = 0L
    @volatile var input = 0L
    @volatile var spill = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
          spill += m.diskBytesSpilled
        }
      }
    def reset(): Unit = synchronized { shuffleWrite = 0; input = 0; spill = 0 }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_scale/sf100")
    val outJson = if (args.length > 1) args(1) else "/tmp/bucket_twotier.json"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vol = new VolumeListener
    spark.sparkContext.addSparkListener(vol)
    import graft.functions.Similarity
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    for (qmod <- Seq(10000L, 2000L)) {
      val isQ = pmod(xxhash64(col("vec_id")), lit(qmod)) === 0L
      def timed(tag: String, df: => DataFrame): Unit = {
        spark.sharedState.cacheManager.clearCache()
        vol.reset()
        var rows = 0L
        def once(): Double = {
          val t = System.nanoTime()
          rows = df.queryExecution.toRdd.count()
          (System.nanoTime() - t) / 1e9
        }
        val cold = once()
        val warm = once()
        lines += f"""{"phase":"query","query":"$tag","qmod":$qmod,"rows":$rows,"cold_s":$cold%.2f,"warm_s":$warm%.2f,"shuffle_write_mb":${vol.shuffleWrite / 1e6}%.1f,"input_mb":${vol.input / 1e6}%.1f,"spill_mb":${vol.spill / 1e6}%.1f}"""
        println(lines.last)
      }
      timed("cosine_topk_64d", Similarity.bruteTopKWith(spark, srcDir, isQ, 10))
      timed("ann_two_tier_64d",
        Similarity.annTwoTierWith(spark, srcDir, isQ, 50, 10))
      timed("ann_lsh_two_tier_64d",
        Similarity.annLshTwoTierWith(spark, srcDir, isQ, 50, 10))
      // recall of each approximate cut vs the brute truth at this qmod
      spark.sharedState.cacheManager.clearCache()
      val bf = Similarity.bruteTopKWith(spark, srcDir, isQ, 10)
        .select("q_id", "vec_id").cache()
      val total = bf.count()
      for ((tag, df) <- Seq(
          "flat" -> Similarity.annTwoTierWith(spark, srcDir, isQ, 50, 10),
          "bucketed" -> Similarity.annLshTwoTierWith(spark, srcDir, isQ, 50, 10))) {
        val matched = df.select("q_id", "vec_id").join(bf, Seq("q_id", "vec_id")).count()
        lines += s"""{"phase":"recall","tier":"$tag","qmod":$qmod,"matched":$matched,"total":$total,"recall_e4":${if (total == 0) 0 else matched * 10000 / total}}"""
        println(lines.last)
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of(outJson),
      lines.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
