package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R29's missing half (r11 verdict item 3): layout_zorder PLANS the
  * z-order file assignment and proves the envelope arithmetic; this
  * probe physically WRITES the assignment — 256 real parquet files —
  * beside the append-order counterfactual at the same file count, then
  * runs the two point predicates over BOTH layouts and reports the
  * MEASURED I/O: records and bytes actually read after parquet
  * footer-stats row-group pruning (`PushedFilters` against each file's
  * min/max). This is the C9-counterfactual discipline applied to data
  * LAYOUT: the claim "z-order makes both predicates prune" becomes
  * executor input metrics, not envelope arithmetic.
  *
  * Usage: runMain graft.tools.ZorderWriteProbe <sfDir> [outJson]
  * Round14Spec runs [[probe]] at sf0.001 and pins the pruning ratio.
  */
object ZorderWriteProbe {

  final case class Cell(layout: String, pred: String, rows: Long,
      recordsRead: Long, bytesRead: Long, wallS: Double)

  private final class InputListener extends SparkListener {
    @volatile var records = 0L
    @volatile var bytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { records += m.inputMetrics.recordsRead
          bytes += m.inputMetrics.bytesRead }
      }
    def reset(): Unit = synchronized { records = 0; bytes = 0 }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
  }

  /** Write both layouts under `outRoot` and measure both point
    * predicates over each. */
  def probe(s: SparkSession, d: String, outRoot: String): Seq[Cell] = {
    deleteRec(new java.io.File(outRoot))
    val zdir = s"$outRoot/zorder"
    val adir = s"$outRoot/append"
    // the z layout: one directory per planned z-file, rows grouped by
    // assignment so every physical file's footer min/max IS the R29
    // envelope; the counterfactual: same row set, same file count,
    // arrival (orderkey) order — the layout a plain append produces
    graft.operators.Relational.withZfile(s, d)
      .repartition(256, col("zfile"))
      .write.mode("overwrite").partitionBy("zfile").parquet(zdir)
    graft.sources.Tables.lineitem(s, d)
      .repartitionByRange(256, col("l_orderkey"))
      .write.mode("overwrite").parquet(adir)
    val li = graft.sources.Tables.lineitem(s, d)
    val maxP = graft.sources.Tables.maxIdFromStats(s, s"$d/lineitem.parquet", "l_partkey", li)
    val maxS = graft.sources.Tables.maxIdFromStats(s, s"$d/lineitem.parquet", "l_suppkey", li)
    val preds: Seq[(String, DataFrame => DataFrame)] = Seq(
      "l_partkey" -> ((df: DataFrame) => df.filter(col("l_partkey") === lit(2 * maxP / 3))),
      "l_suppkey" -> ((df: DataFrame) => df.filter(col("l_suppkey") === lit(maxS / 3))))
    val listener = new InputListener
    s.sparkContext.addSparkListener(listener)
    try {
      for {
        (layout, dir) <- Seq("zorder" -> zdir, "append" -> adir)
        (pred, f) <- preds
      } yield {
        s.sharedState.cacheManager.clearCache()
        listener.reset()
        val t0 = System.nanoTime()
        // a real aggregate collect — never a bare count, which a
        // footer row-count or OptimizeOneRowPlan can satisfy without
        // touching the data (the round-13 vacuous-probe lesson)
        val rows = f(s.read.parquet(dir))
          .agg(count(lit(1)), sum(col("l_quantity"))).head().getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        // deterministic drain of the async listener bus — a fixed
        // sleep races under host load (stage events from this cell
        // could be wiped by the next cell's reset() or attributed to
        // it, flaking Round14Spec's 4x pruning assertion)
        org.apache.spark.graftbridge.ListenerBridge
          .waitUntilEmpty(s.sparkContext, 30000L)
        Cell(layout, pred, rows, listener.records, listener.bytes, wall)
      }
    } finally s.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf10")
    val outJson = if (args.length > 1) args(1) else "/tmp/zorder_write.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cells = probe(spark, sfDir, "/tmp/graft_zorder_probe")
    val json = cells.map(c =>
      s"""{"layout":"${c.layout}","pred":"${c.pred}","rows":${c.rows},""" +
        s""""records_read":${c.recordsRead},"bytes_read":${c.bytesRead},""" +
        f""""wall_s":${c.wallS}%.2f}""").mkString("[", ",", "]")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
