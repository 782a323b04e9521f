package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, LiveStore}

/** The stream-maintained queryable store: point lookups must work — and
  * be shard-pruned — WHILE ingestion runs; the final snapshot must
  * equal the batch KTable over the same events; upsert I/O must scale
  * with the BATCH's key count (not the store's); and readers must never
  * observe a half-committed write. */
class LiveStoreSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  private def dataFiles(dir: java.io.File): Map[String, Long] = {
    def rec(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(rec)
      else Seq(f)
    rec(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  test("point lookup mid-stream reflects each ingested prefix; final snapshot = batch KTable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_livestore").toFile
    val dir = root.getPath + "/store"
    val input = MemoryStream[Ev]
    val q = input.toDS().toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        LiveStore.upsert(b, id, dir)
      }
      .outputMode("update").start()

    // batch 1: two users; user 7 ends on a purchase
    val b1 = Seq(
      Ev(1, ts(0), 7, "signup", 0.0), Ev(2, ts(1), 7, "purchase", 12.34),
      Ev(3, ts(0), 23, "click", 1.0)) // user 23 shares shard 7 with user 7
    input.addData(b1: _*)
    q.processAllAvailable()

    val mid = LiveStore.lookup(spark, dir, 7L).collect()
    assert(mid.length == 1)
    assert(mid(0).getAs[String]("last_type") == "purchase")
    assert(mid(0).getAs[Double]("last_value") == 12.34)
    assert(mid(0).getAs[Long]("n_events") == 2L)
    // the point read is partition-pruned to user 7's shard: the scan
    // must carry a NON-EMPTY PartitionFilters on the shard column
    // (every partitioned scan prints "PartitionFilters: [...]", so a
    // bare contains() check would pass with zero pruning)
    val plan = LiveStore.lookup(spark, dir, 7L).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isDefined,
      s"lookup should prune on the shard partition column:\n$plan")
    // at-least-once redelivery: replaying an already-committed batch id
    // must be a no-op (n_events would otherwise double-count)
    LiveStore.upsert(b1.toDF(), 0L, dir)
    assert(LiveStore.lookup(spark, dir, 7L).collect()(0).getAs[Long]("n_events") == 2L)

    val filesAfterB1 = dataFiles(new java.io.File(dir))

    // batch 2: user 7 gets a newer event; a THIRD user lands elsewhere.
    // user 23 is NOT in this batch — it must survive untouched.
    val b2 = Seq(
      Ev(4, ts(5), 7, "error", 3.5),
      Ev(5, ts(2), 8, "view", 9.99))
    input.addData(b2: _*)
    q.processAllAvailable()

    // THE SCALE CONTRACT (the reference's RocksDB point-write analog):
    // batch 2 wrote exactly one delta dir holding exactly its own keys;
    // every file that existed before the batch is byte-identical after.
    val filesAfterB2 = dataFiles(new java.io.File(dir))
    assert(filesAfterB1.forall { case (p, len) => filesAfterB2.get(p).contains(len) },
      "an upsert must never rewrite existing store files")
    val newFiles = filesAfterB2.keySet -- filesAfterB1.keySet
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("delta_b1")),
      s"batch 2 should land only under delta_b1, got: $newFiles")
    assert(spark.read.parquet(s"$dir/delta_b1").count() == 2L,
      "the delta must hold exactly the batch's distinct keys")

    val mid2 = LiveStore.lookup(spark, dir, 7L).collect()
    assert(mid2(0).getAs[String]("last_type") == "error")
    assert(mid2(0).getAs[Long]("n_events") == 3L)
    // untouched key absent from the batch survives (merge-on-read)
    val k23 = LiveStore.lookup(spark, dir, 23L).collect()
    assert(k23.length == 1 && k23(0).getAs[Long]("n_events") == 1L)

    q.stop()

    // final snapshot == batch KTable over the union of all events
    val all = (b1 ++ b2).toDF()
    val want = graft.streaming.Streams.latestStateAgg(all)
    val got = LiveStore.snapshot(spark, dir)
      .select(want.columns.map(col): _*)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)

    // compaction folds base+deltas to one base with the same contents.
    // Retired inputs stay on disk for ONE grace cycle (an in-flight
    // scan that planned over the old roots must be able to drain) but
    // are INVISIBLE to any new reader — the snapshot comes from the
    // new base alone.
    def storeDirs() = Option(new java.io.File(dir).listFiles()).get
      .filter(_.isDirectory).map(_.getName).toSet
    LiveStore.compact(spark, dir, purgeTombstones = false)
    val dirsNow = storeDirs()
    assert(dirsNow.exists(_.startsWith("base_v")),
      s"compaction should publish a new base: $dirsNow")
    assert(dirsNow.exists(_.startsWith("delta_b")),
      s"retired deltas must survive the grace cycle for in-flight scans: $dirsNow")
    val got2 = LiveStore.snapshot(spark, dir).select(want.columns.map(col): _*)
    assert(got2.except(want).count() == 0 && want.except(got2).count() == 0)
    // the NEXT compaction cycle drains the grace period: retired dirs
    // are physically deleted, contents unchanged
    LiveStore.compact(spark, dir, purgeTombstones = false)
    val dirsAfter = storeDirs()
    assert(!dirsAfter.exists(_.startsWith("delta_b")),
      s"the next cycle must delete dirs retired a cycle ago: $dirsAfter")
    val got3 = LiveStore.snapshot(spark, dir).select(want.columns.map(col): _*)
    assert(got3.except(want).count() == 0 && want.except(got3).count() == 0)
    ()
  }

  test("a crash between staging write and rename is invisible to readers and heals on replay") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_livestore_kill").toFile
    val dir = root.getPath + "/store"
    val b0 = Seq(Ev(1, ts(0), 7, "signup", 0.0), Ev(2, ts(1), 9, "click", 1.0))
    LiveStore.upsert(b0.toDF(), 0L, dir)

    // simulate the crash: batch 1's staging dir exists (half-written —
    // here: a stale full copy plus junk) but the atomic rename never ran
    val staging = new java.io.File(dir, "_staging_delta_b1")
    new java.io.File(staging, "shard=7").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staging, "shard=7/part-junk.parquet").toPath,
      Array[Byte](1, 2, 3))

    // readers never see the uncommitted write
    val snap = LiveStore.snapshot(spark, dir)
    assert(snap.count() == 2L)
    assert(snap.filter(col("user_id") === 7L).collect()(0).getAs[Long]("n_events") == 1L)

    // the source redelivers batch 1: the replay discards the garbage
    // staging dir and commits cleanly, exactly once
    val b1 = Seq(Ev(3, ts(2), 7, "purchase", 5.0))
    LiveStore.upsert(b1.toDF(), 1L, dir)
    LiveStore.upsert(b1.toDF(), 1L, dir) // second redelivery: no-op
    val after = LiveStore.snapshot(spark, dir)
    assert(after.filter(col("user_id") === 7L).collect()(0).getAs[Long]("n_events") == 2L)
    assert(!staging.exists, "a committed batch must leave no staging dir behind")
    ()
  }
}
