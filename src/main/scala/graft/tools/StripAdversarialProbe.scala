package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** corpus_strip's ADVERSARIAL re-attach tier, measured (r13 verdict
  * item 5): tiers (a) broadcast-drop-lists and (b) broadcast-keys were
  * measured at sf100, but tier (c) — boilerplate at CORPUS scale,
  * where neither the drop positions nor the affected doc-id key set
  * fits a broadcast — had never been run on data that actually
  * triggers it. This probe synthesizes that corpus (the point-mass
  * analog of the LSH salting fixture): ~80% of docs OPEN with the same
  * 128-token boilerplate block, so two full chunk windows (64/48
  * size/stride) collide corpus-wide and every non-canonical affected
  * doc carries a 112-position drop list. At 5M docs that is ~450M
  * drop positions / ~4M affected keys — both orders of magnitude over
  * the 32 MB broadcast budget, forcing the full-shuffle fallback.
  *
  * The probe reports the measured PROFILE (n_dup_docs, n_pos), the
  * tier the pure selector picks from it (must be 2), wall cold/warm,
  * and shuffle volume — so all three re-attach tiers are licensed by
  * data, not two of three.
  *
  * Usage: runMain graft.tools.StripAdversarialProbe [outJson] [cpus] [nDocs]
  */
object StripAdversarialProbe {

  /** Deterministic boilerplate-heavy corpus, documents-shaped (the
    * DataGen xxhash64 discipline — byte-identical at any parallelism).
    * Affected docs (doc_id % 5 != 0): 128 shared boilerplate tokens +
    * 32 unique tail tokens; clean docs: 160 unique tokens. */
  def gen(s: SparkSession, nDocs: Long, cpus: Int): DataFrame = {
    val boiler = (0 until 128).map(i => s"boiler$i").mkString(" ")
    val uniq = (0 until 32).map(i =>
      concat(lit("u"), xxhash64(lit(i), col("id")))).toSeq
    val uniqLong = (0 until 160).map(i =>
      concat(lit("u"), xxhash64(lit(1000 + i), col("id")))).toSeq
    s.range(0, nDocs, 1, cpus * 4).toDF("id")
      .select(col("id").as("doc_id"),
        when(col("id") % 5 =!= 0,
          concat_ws(" ", (lit(boiler) +: uniq): _*))
          .otherwise(concat_ws(" ", uniqLong: _*)).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), col("id") % 4).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
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
    val outJson = args.headOption.getOrElse("/tmp/strip_adv.json")
    val cpus = if (args.length > 1) args(1) else "32"
    val nDocs = if (args.length > 2) args(2).toLong else 5000000L
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
    import graft.sources.Tables

    val dir = s"/tmp/graft_scale/strip_adv_$nDocs"
    Tables.buildOnce(s"$dir/documents.parquet")(
      gen(spark, nDocs, cpus.toInt))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    // the strip itself — cold pays the drop-list capital + rewrite,
    // warm rides the persisted capital (the op's real steady state)
    def once(): (Long, Double) = {
      vol.reset()
      val t = System.nanoTime()
      val rows = graft.SparkEntry.queries("corpus_strip")(spark, dir)
        .queryExecution.toRdd.count()
      (rows, (System.nanoTime() - t) / 1e9)
    }
    val (rows, cold) = once()
    val coldShuffle = vol.shuffleWrite
    val coldSpill = vol.spill
    spark.sharedState.cacheManager.clearCache()
    val (_, warm) = once()

    // the measured profile + the tier the pure selector picks from it
    val prof = spark.read.parquet(
      s"${Tables.workDir(spark)}/strip_drop_" + Tables.datasetTag(dir))
      .agg(count(lit(1)), coalesce(sum(size(col("drop_pos")).cast("long")), lit(0L)))
      .head()
    val (nDup, nPos) = (prof.getLong(0), prof.getLong(1))
    val tier = graft.functions.Pipeline.stripTier(nDup, nPos)
    val hint = graft.functions.Pipeline.stripAttachHint(nDup, nPos, cpus.toInt)
    lines += f"""{"phase":"query","query":"corpus_strip_adversarial","n_docs":$nDocs,"rows":$rows,"n_dup_docs":$nDup,"n_pos":$nPos,"tier":$tier,"attach_hint":"$hint","cold_s":$cold%.2f,"warm_s":$warm%.2f,"cold_shuffle_mb":${coldShuffle / 1e6}%.1f,"warm_shuffle_mb":${vol.shuffleWrite / 1e6}%.1f,"cold_spill_mb":${coldSpill / 1e6}%.1f}"""
    println(lines.last)

    // conservation sanity at this scale: the ledger sums balance and
    // the strip removed real mass
    val sums = graft.SparkEntry.queries("corpus_strip")(spark, dir)
      .agg(sum(col("n_tok_orig")), sum(col("n_dropped")), sum(col("n_kept")))
      .head()
    val (o, dd, kk) = (sums.getLong(0), sums.getLong(1), sums.getLong(2))
    lines += s"""{"phase":"law","n_tok_orig":$o,"n_dropped":$dd,"n_kept":$kk,"balanced":${o == dd + kk}}"""
    println(lines.last)
    java.nio.file.Files.writeString(java.nio.file.Path.of(outJson),
      lines.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
