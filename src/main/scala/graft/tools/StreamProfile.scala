package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribute the streaming bench floor: run one stream_* query in a
  * Bench-shaped session and print every micro-batch's durationMs
  * breakdown from the StreamingQueryListener (triggerExecution =
  * total; queryPlanning / getBatch / addBatch / walCommit /
  * commitOffsets break it down), so floor-trimming targets measured
  * cost, not guesses. Usage:
  * runMain graft.tools.StreamProfile <sfDir> <name> [reps]
  */
object StreamProfile {
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
    // args beyond reps: key=value pairs applied as session confs
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        val shards = p.stateOperators.map(_.numShufflePartitions).mkString(",")
        println(s"[stream-profile] batch=${p.batchId} rows=${p.numInputRows} " +
          s"stateShards=[$shards] " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
    }
    spark.streams.addListener(listener)
    // jobs-per-rep counter: wall-clock on this host swings 2-4x with
    // I/O stall windows, but the JOB COUNT of a micro-batch pipeline is
    // deterministic — the honest mechanism signal for "fewer jobs per
    // batch" changes.
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    graft.sources.Tables.lineitem(spark, sfDir).count()
    // "probe_noop": stream_latest's exact stateful plan with the sink
    // body replaced by count() (no parquet write, no commit protocol) —
    // isolates how much of addBatch is the sink write job
    val probes: Map[String, (SparkSession, String) => Long] = Map(
      "probe_noop" -> ((s, d) => {
        val df = graft.streaming.Streams.latestStateAgg(
          graft.streaming.Streams.eventStream(s, d).toDF())
        val q = df.writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.count(); ()
          }
          .outputMode("update").start()
        q.processAllAvailable(); q.stop(); 0L
      }))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = probes.get(name) match {
        case Some(p) => p(spark, sfDir)
        case None => graft.SparkEntry.queries(name)(spark, sfDir).count()
      }
      println(f"[stream-profile] $name rep$i total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n jobs=${jobCount.getAndSet(0)}")
    }
    spark.stop()
  }
}
