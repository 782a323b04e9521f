package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S16's speed claim, EARNED in-repo (r13 verdict item 2): at the
  * testdata's 64 dims the two-tier ANN loses to brute force on
  * wall-clock at every measured query count (SCALE.md round 15 —
  * per-pair cost there is join-row materialization + heap insertion,
  * not the dot product). Production embeddings are 768-1536-d, where
  * the exact dot IS the pair cost. This probe builds a ≥256-d fixture
  * and measures the crossover with the dot product dominating.
  *
  * The fixture is a deterministic SIGN-BLOCK expansion of the real
  * embeddings table: output block k is the source vector with
  * per-(k, dim) md5-derived sign flips, so for every pair
  * dot_hd = factor · dot_64 and the QUANTIZED cosine is bit-identical
  * to the 64-d cosine (sign flips commute with quantize; the ×factor
  * scaling cancels exactly in IEEE — powers of two). Ground truth is
  * therefore KNOWN (brute top-k at 256-d equals brute top-k at 64-d,
  * pinned by Round16Spec), while per-pair multiply and byte cost are
  * exactly factor×. The probe drives the SAME registered operator
  * code (annTwoTierWith/bruteTopKWith) with inDims = factor·64.
  *
  * Usage: runMain graft.tools.TwoTierHdProbe <srcDir> [outJson] [cpus] [factor]
  */
object TwoTierHdProbe {

  def hdSign(k: Int, i: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"hd:$k:$i".getBytes("UTF-8"))
    if (((h(0) >> 7) & 1) == 0) 1f else -1f
  }

  /** 64-d → factor·64-d sign-block expansion (see object doc). */
  def expand(df: DataFrame, factor: Int, srcDims: Int = 64): DataFrame =
    df.withColumn("embedding", concat((0 until factor).map { k =>
      val signs = array((0 until srcDims).map(i => lit(hdSign(k, i))): _*)
      zip_with(col("embedding"), signs, (x, s) => (x * s).cast("float"))
    }: _*))

  /** Build the HD dataset (under the scratch root — source dirs like
    * /root/testdata are read-only) if absent; returns its dir. */
  def ensureHd(s: SparkSession, srcDir: String, factor: Int): String = {
    import graft.sources.Tables
    val dims = factor * 64
    val hdDir = s"${Tables.workDir(s)}/hd${dims}_" + Tables.datasetTag(srcDir)
    Tables.buildOnce(s"$hdDir/embeddings.parquet")(
      expand(s.read.parquet(s"$srcDir/embeddings.parquet"), factor))
    hdDir
  }

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
    val outJson = if (args.length > 1) args(1) else "/tmp/twotier_hd.json"
    val cpus = if (args.length > 2) args(2) else "32"
    val factor = if (args.length > 3) args(3).toInt else 4
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
    val dims = factor * 64

    val t0 = System.nanoTime()
    val hdDir = ensureHd(spark, srcDir, factor)
    val genS = (System.nanoTime() - t0) / 1e9
    val lines = scala.collection.mutable.ArrayBuffer(
      f"""{"phase":"gen","dims":$dims,"dir":"$hdDir","gen_s":$genS%.2f}""")
    println(lines.last)

    import graft.functions.Similarity
    // ~200 and ~1000 queries of the ~2M sf100 vectors — the same
    // md5-free deterministic thinning the 64-d round-15 pair used
    for (qmod <- Seq(10000L, 2000L)) {
      val isQ = pmod(xxhash64(col("vec_id")), lit(qmod)) === 0L
      def timed(tag: String, df: => DataFrame): (Long, Double, Double) = {
        spark.sharedState.cacheManager.clearCache()
        vol.reset()
        var rows = 0L
        def once(): Double = {
          val t = System.nanoTime()
          // toRdd.count(): force the real plan, never a count() rewrite
          rows = df.queryExecution.toRdd.count()
          (System.nanoTime() - t) / 1e9
        }
        val cold = once()
        val warm = once()
        lines += f"""{"phase":"query","query":"$tag","qmod":$qmod,"rows":$rows,"cold_s":$cold%.2f,"warm_s":$warm%.2f,"shuffle_write_mb":${vol.shuffleWrite / 1e6}%.1f,"input_mb":${vol.input / 1e6}%.1f,"spill_mb":${vol.spill / 1e6}%.1f}"""
        println(lines.last)
        (rows, cold, warm)
      }
      timed(s"cosine_topk_hd$dims", Similarity.bruteTopKWith(spark, hdDir, isQ, 10))
      timed(s"ann_two_tier_hd$dims",
        Similarity.annTwoTierWith(spark, hdDir, isQ, 50, 10, dims))
      // recall of the two-tier cut vs the brute truth at the SAME dims
      spark.sharedState.cacheManager.clearCache()
      val bf = Similarity.bruteTopKWith(spark, hdDir, isQ, 10)
        .select("q_id", "vec_id")
      val tt = Similarity.annTwoTierWith(spark, hdDir, isQ, 50, 10, dims)
        .select("q_id", "vec_id")
      val total = bf.count()
      val matched = tt.join(bf, Seq("q_id", "vec_id")).count()
      lines += s"""{"phase":"recall","qmod":$qmod,"matched":$matched,"total":$total,"recall_e4":${if (total == 0) 0 else matched * 10000 / total}}"""
      println(lines.last)
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of(outJson),
      lines.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
