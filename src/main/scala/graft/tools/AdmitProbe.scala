package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-batch cost attribution for `stream_admit` (VERDICT r10
  * next-round #4): the heaviest streaming number on the bench board
  * (7.0 s addBatch / 9 batches at sf0.1) against a contract that says
  * each batch is O(batch) signature work + one shuffle-hash probe.
  *
  * What the probe separates, per micro-batch:
  *   - how many Spark JOBS the batch runs (the admit loop's fixed job
  *     count is 5: bands checkpoint, digests checkpoint, the graded
  *     output write, and two delta appends — each paying local-mode
  *     scheduling floor);
  *   - the batch's INPUT BYTES (stage input metrics): if the growing
  *     delta set or the base index were re-scanned superlinearly,
  *     input would grow with batch index beyond base + O(batch);
  *   - the streaming engine's own durationMs split (queryPlanning /
  *     addBatch / walCommit) — the stream_floor view.
  *
  * Jobs are bucketed to batches via the job description MicroBatch-
  * Execution sets ("... batch = N"); jobs outside any batch (source
  * listing, index build) land in batch -1.
  *
  * Usage: runMain graft.tools.AdmitProbe <sfDir> [outJson] [cpus]
  */
object AdmitProbe {

  private final class JobTape extends SparkListener {
    // jobId -> (batchId, startNs)
    private val open = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    // batchId -> [jobs, wallMs, inputBytes, shuffleWriteBytes]
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
    private def acc(b: Long): Array[Long] =
      perBatch.computeIfAbsent(b, _ => new Array[Long](4))

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      val batch = "batch = (\\d+)".r.findFirstMatchIn(desc)
        .map(_.group(1).toLong).getOrElse(-1L)
      open.put(e.jobId, (batch, System.nanoTime()))
      e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
    }

    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      Option(open.remove(e.jobId)).foreach { case (batch, t0) =>
        val a = acc(batch)
        a.synchronized {
          a(0) += 1
          a(1) += (System.nanoTime() - t0) / 1000000L
        }
      }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val jid = stageToJob.getOrDefault(e.stageInfo.stageId, -1)
      val batch = Option(open.get(jid)).map(_._1).getOrElse(-1L)
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        val a = acc(batch)
        a.synchronized {
          a(2) += m.inputMetrics.bytesRead
          a(3) += m.shuffleWriteMetrics.bytesWritten
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = if (args.length > 1) args(1) else "/tmp/admit_probe.json"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("GRAFT_STATESTORE")
      .foreach(v => spark.conf.set("graft.stream.stateStore", v))

    // streaming-engine floor split per batch
    val floor = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        val a = floor.computeIfAbsent(e.progress.batchId, _ => new Array[Long](4))
        a.synchronized {
          a(0) += d.getOrDefault("triggerExecution", 0L)
          a(1) += d.getOrDefault("addBatch", 0L)
          a(2) += d.getOrDefault("queryPlanning", 0L)
          a(3) += d.getOrDefault("walCommit", 0L) + d.getOrDefault("commitOffsets", 0L)
        }
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    val tape = new JobTape
    spark.sparkContext.addSparkListener(tape)

    // warm the source tables so batch -1 separates index build from scan
    graft.sources.Tables.documents(spark, sfDir).count()
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("stream_admit")(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9

    // let the async listener bus drain (same stable-count poll Bench uses)
    import scala.jdk.CollectionConverters._
    def snap(): Long = tape.perBatch.asScala.values.map(a => a.synchronized(a(0))).sum
    var prev = -1L; var cur = snap()
    val deadline = System.nanoTime() + 5000000000L
    while (cur != prev && System.nanoTime() < deadline) {
      Thread.sleep(100); prev = cur; cur = snap()
    }

    def mb(b: Long): Double = b / 1e6
    val batchRows = tape.perBatch.asScala.toSeq.sortBy(_._1).map { case (b, a) =>
      val fl = Option(floor.get(b)).getOrElse(new Array[Long](4))
      a.synchronized { fl.synchronized {
        f"""{"batch":$b,"jobs":${a(0)},"job_wall_ms":${a(1)},"input_mb":${mb(a(2))}%.1f,"shuffle_write_mb":${mb(a(3))}%.1f,"trigger_ms":${fl(0)},"add_batch_ms":${fl(1)},"planning_ms":${fl(2)},"wal_ms":${fl(3)}}"""
      }}
    }
    val out = s"""{"probe":"stream_admit","sf_dir":"$sfDir","rows":$rows,"wall_s":${f"$wall%.2f"},"batches":[${batchRows.mkString(",\n")}]}"""
    println(out)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out + "\n")
    spark.stop()
  }
}
