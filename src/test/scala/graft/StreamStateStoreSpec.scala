package graft

/** RocksDB state-store posture (VERDICT r9 next-round #2).
  *
  * The reference keys all streaming state through a RocksDB-backed
  * KTable by default (surge/kafka/streams/CustomRocksDBConfigSetter
  * .scala:32); graft's stateful stream_* ops previously ran only on
  * Spark's heap-backed HDFSBackedStateStoreProvider, which cannot hold
  * 100 TB-scale per-key state. `graft.stream.stateStore=rocksdb` scopes
  * Spark's in-box RocksDBStateStoreProvider over every stream run
  * (Streams.withStreamShards). Two claims proven here:
  *
  *  1. the flag genuinely engages RocksDB (progress events carry
  *     rocksdb custom metrics — not just a conf set nobody reads);
  *  2. the provider is RESULT-INVISIBLE across the state shapes the
  *     engine uses: arbitrary-fold state (stream_fold), bounded-buffer
  *     state (stream_latest_n), an order-sensitive md5 chain
  *     (stream_audit_chain — silent state loss or reorder cannot
  *     pass), watermarked dedup state (stream_dedup), and session
  *     windows (stream_session).
  *
  * The full-gate equivalent (GRAFT_STATESTORE=rocksdb through
  * graft.Verify + DuckDB parity) is the round's recorded evidence; this
  * spec keeps the invariant cheap to re-check per commit.
  */
class StreamStateStoreSpec extends SparkSpec {

  private def withRocks[T](body: => T): T = {
    spark.conf.set("graft.stream.stateStore", "rocksdb")
    try body
    finally spark.conf.unset("graft.stream.stateStore")
  }

  private def sameRows(name: String): Unit = {
    val base = run(name)
    val baseRows = base.collect().map(_.toString).sorted.toSeq
    val rocks = withRocks(run(name))
    val rockRows = rocks.collect().map(_.toString).sorted.toSeq
    assert(base.schema == rocks.schema, s"$name schema drift under rocksdb")
    assert(baseRows == rockRows, s"$name rows differ under rocksdb")
  }

  test("the rocksdb flag engages the RocksDB provider (progress metrics say so)") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import StreamingQueryListener._
    val sawRocks = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sawState = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach { so =>
          sawState.set(true)
          import scala.jdk.CollectionConverters._
          if (so.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")))
            sawRocks.set(true)
        }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    try {
      withRocks(run("stream_fold").collect())
      // the listener bus is async — poll briefly for the progress events
      val deadline = System.nanoTime() + 10000000000L
      while (!sawRocks.get && System.nanoTime() < deadline) Thread.sleep(100)
    } finally spark.streams.removeListener(l)
    assert(sawState.get, "no stateful progress events observed")
    assert(sawRocks.get, "stateful query ran but reported no rocksdb metrics " +
      "— provider flag did not engage")
  }

  test("stream_fold is provider-invisible")(sameRows("stream_fold"))
  test("stream_latest_n is provider-invisible")(sameRows("stream_latest_n"))
  test("stream_audit_chain (md5 chain state) is provider-invisible")(
    sameRows("stream_audit_chain"))
  test("stream_dedup (watermarked state) is provider-invisible")(
    sameRows("stream_dedup"))
  test("stream_session (session windows) is provider-invisible")(
    sameRows("stream_session"))
}
