package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EventSourcing

/** The continuously-maintained queryable state store.
  *
  * Surge's KTable is not a batch artifact: the stream UPDATES it and
  * any aggregate's state is queryable by key at any moment
  * (`/root/reference/modules/common/src/main/scala/surge/kafka/streams/AggregateStateStoreKafkaStreams.scala`,
  * `SurgeAggregateStore.scala:31` `getAggregateBytes(aggregateId)`,
  * `KafkaStreamsKeyValueStore.scala`). graft's batch twin (E12) built
  * the sharded snapshot once; this maintains it FROM THE STREAM:
  *
  *  - each micro-batch folds its events to packed per-key rows
  *    ([[EventSourcing.packedState]] — max packed (ts,event_id,payload),
  *    max ts, event count: every component a commutative-monoid merge,
  *    so batch-state ⊔ store-state is one hash-agg, order-independent);
  *  - the upsert rewrites ONLY the shard partitions the batch touched
  *    (dynamic partition overwrite over `partitionBy(shard)` — the
  *    compacted-topic log-compaction analog; at 100 TB a batch rewrites
  *    ~16/16 shards of hot traffic but each shard write is bounded by
  *    that shard's key count, not the log length);
  *  - a point lookup between batches prunes to one shard directory and
  *    pushes the key filter into that scan — `getAggregateBytes` while
  *    ingestion runs.
  *
  * A production deployment would put a transactional table format
  * (or the E12 bucketed layout + a version pointer) under the store so
  * readers never observe a half-committed batch; here foreachBatch
  * serializes upserts, and lookups run between micro-batches.
  */
object LiveStore {

  val nShards = 16

  private def shardOf(c: org.apache.spark.sql.Column) = pmod(c, lit(nShards.toLong))

  private def readPacked(s: SparkSession, dir: String): Option[DataFrame] = {
    val f = new java.io.File(dir)
    // hidden entries (the batch marker, _SUCCESS) are not data — an
    // empty-batch commit leaves a dir a parquet read cannot infer from
    val hasData = f.exists && Option(f.listFiles()).exists(
      _.exists(x => !x.getName.startsWith("_") && !x.getName.startsWith(".")))
    if (hasData) Some(s.read.parquet(dir)) else None
  }

  // lives INSIDE the store dir (underscore prefix = invisible to
  // Spark's file listing) so a store reset removes it with the data
  private def lastBatchFile(dir: String) = new java.io.File(dir, "_last_batch")

  /** Merge one micro-batch of raw events into the store, exactly once
    * per batch id: foreachBatch is AT-LEAST-once (a crash between the
    * store commit and the offset commit redelivers the batch), and
    * while the max-merged pk/mts components absorb a replay, the
    * summed n_events would double-count — so a committed-batch marker
    * makes redelivery a no-op. */
  def upsert(batch: DataFrame, batchId: Long, dir: String): Unit = {
    val s = batch.sparkSession
    val marker = lastBatchFile(dir)
    if (marker.exists && java.nio.file.Files.readString(marker.toPath).trim.toLong >= batchId)
      return // replayed batch — already merged
    if (batch.isEmpty) { commitMarker(dir, batchId); return }
    // scope the dynamic-overwrite mode to this upsert — leaking it to
    // the session would silently change every later partitioned
    // overwrite from truncate-all to replace-matching
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      upsertInner(s, batch, dir)
      commitMarker(dir, batchId)
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def commitMarker(dir: String, batchId: Long): Unit = {
    val f = lastBatchFile(dir)
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(f.toPath, batchId.toString)
    ()
  }

  private def upsertInner(s: SparkSession, batch: DataFrame, dir: String): Unit = {
    val bs = EventSourcing.packedState(batch)
      .withColumn("shard", shardOf(col("user_id")))
    val merged = readPacked(s, dir) match {
      case None => bs
      case Some(ex) =>
        // only the touched shards participate — and the overwrite must
        // carry EVERY key of a touched shard, or untouched keys in that
        // shard would vanish with the old partition directory
        val touched = bs.select("shard").distinct() // ≤ nShards rows
        ex.join(broadcast(touched), Seq("shard"), "left_semi")
          .unionByName(bs)
          .groupBy("user_id", "shard") // shard is functionally dependent
          .agg(max(col("pk")).as("pk"), max(col("mts")).as("mts"),
            sum(col("n_events")).as("n_events"))
          // the store dir is both read and overwritten in this batch —
          // materialize the read side before the commit deletes the old
          // partition files (a transactional format subsumes this)
          .localCheckpoint(true)
    }
    merged.select("user_id", "pk", "mts", "n_events", "shard")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Point lookup BY KEY — prunes to one shard directory (spec asserts
    * PartitionFilters) and pushes the user_id filter into that scan. */
  def lookup(s: SparkSession, dir: String, key: Long): DataFrame =
    EventSourcing.decodeState(
      s.read.parquet(dir)
        .filter(col("shard") === lit(key % nShards) && col("user_id") === lit(key)))

  /** Full decoded snapshot (the read-side view of the whole store). */
  def snapshot(s: SparkSession, dir: String): DataFrame =
    EventSourcing.decodeState(s.read.parquet(dir))

  /** E21 `es_live_compaction`: tombstone DELETE semantics on the live
    * store — the full compacted-topic lifecycle, continuously:
    *
    *  - while the stream runs, tombstone records flow through the same
    *    packed-max upsert as every record; a tombstone that is a key's
    *    latest record MASKS the key (reads decode-and-drop — a Kafka
    *    consumer's view of a compacted topic before the cleaner runs);
    *  - afterwards a LOG-CLEANER pass physically purges dead keys: one
    *    read → filter → rewrite of the store partitions (Kafka's
    *    cleaner works per segment; here per shard partition).
    *
    * Purging lazily — not per batch — is correctness-critical under
    * out-of-order delivery: a tombstoned key must stay in the store AS
    * a tombstone row, or an out-of-order EARLIER record arriving in a
    * later batch would resurrect the key the tombstone killed.
    * Final store contents = the batch es_compaction oracle. */
  private[graft] def liveCompaction(s: SparkSession, d: String): DataFrame = {
    val dir = s"${graft.sources.Tables.workDir(s)}/livecompact"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(new java.io.File(dir))
    val q = Streams.eventStream(s, d).toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        upsert(batch, id, dir)
      }
      .outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()
    // log-cleaner pass: tombstone-latest keys leave the store. The dir
    // is read AND overwritten — checkpoint the surviving rows before
    // the overwrite deletes the files under them (the in-place-upsert
    // trap; a transactional table format subsumes this).
    val tombstoneCode = 1L // evTypes.indexOf("error")
    val survivors = s.read.parquet(dir)
      .filter(pmod(graft.operators.Packed.payload(col("pk")), lit(10L)) =!= tombstoneCode)
      .localCheckpoint(true)
    survivors.write.mode("overwrite").partitionBy("shard").parquet(dir)
    EventSourcing.decodeCompacted(
      s.read.parquet(dir).select(col("user_id"), col("pk")))
  }

  /** Driver query: maintain the store from the event stream, then
    * return the final snapshot — which must equal the batch KTable
    * (E1's oracle), proving the upsert path bit-exact. */
  private[graft] def liveStore(s: SparkSession, d: String): DataFrame = {
    val dir = s"${graft.sources.Tables.workDir(s)}/livestore"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(new java.io.File(dir))
    val q = Streams.eventStream(s, d).toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        upsert(batch, id, dir)
      }
      .outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()
    snapshot(s, dir)
  }
}
