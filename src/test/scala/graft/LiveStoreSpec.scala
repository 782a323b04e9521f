package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, LiveStore}

/** The stream-maintained queryable store: point lookups must work — and
  * be shard-pruned — WHILE ingestion runs, and the final snapshot must
  * equal the batch KTable over the same events. */
class LiveStoreSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  test("point lookup mid-stream reflects each ingested prefix; final snapshot = batch KTable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_livestore").toString + "/store"
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

    // batch 2: user 7 gets a newer event; a THIRD user lands in an
    // untouched shard... and user 23's shard is rewritten — 23 must survive
    val b2 = Seq(
      Ev(4, ts(5), 7, "error", 3.5),
      Ev(5, ts(2), 8, "view", 9.99))
    input.addData(b2: _*)
    q.processAllAvailable()

    val mid2 = LiveStore.lookup(spark, dir, 7L).collect()
    assert(mid2(0).getAs[String]("last_type") == "error")
    assert(mid2(0).getAs[Long]("n_events") == 3L)
    // untouched key in a rewritten shard survives the dynamic overwrite
    val k23 = LiveStore.lookup(spark, dir, 23L).collect()
    assert(k23.length == 1 && k23(0).getAs[Long]("n_events") == 1L)

    q.stop()

    // final snapshot == batch KTable over the union of all events
    val all = (b1 ++ b2).toDF()
    val want = graft.streaming.Streams.latestStateAgg(all)
    val got = LiveStore.snapshot(spark, dir)
      .select(want.columns.map(col): _*)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }
}
