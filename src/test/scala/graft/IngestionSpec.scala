package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.Multimodal
import graft.streaming.Ev

/** A Kafka record shape: key/value bytes + topic metadata. */
final case class KRecord(key: Array[Byte], value: Array[Byte], topic: String,
    timestamp: Timestamp)

/** C3: Kafka-shaped ingestion — byte key/value envelopes (exactly what
  * the Kafka source emits) parsed into typed events, and the
  * mapPartitions decoder slot (X3 plumbing). */
class IngestionSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  test("byte envelopes parse into typed events and fold through the engine") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def rec(e: Ev): KRecord = KRecord(
      e.user_id.toString.getBytes("UTF-8"),
      s"""{"event_id":${e.event_id},"ts":"${e.ts}","user_id":${e.user_id},"event_type":"${e.event_type}","value":${e.value}}"""
        .getBytes("UTF-8"),
      "events", e.ts)
    val input = MemoryStream[KRecord]
    // the exact transform a Kafka readStream gets: value bytes → string →
    // from_json with the event schema
    val parsed = input.toDS().toDF()
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")).as("e"))
      .select("e.*").as[Ev]
    val folded = graft.streaming.Streams.foldEvents(parsed)
    val q = folded.writeStream.format("memory").queryName("kafka_shape_test")
      .outputMode("update").start()
    input.addData(rec(Ev(1, ts(0), 3, "signup", 0.0)), rec(Ev(2, ts(1), 3, "purchase", 2.50)))
    q.processAllAvailable()
    q.stop()
    val st = spark.table("kafka_shape_test").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("balance_c")).toMap
    assert(st == Map(3L -> 1250L))
  }

  test("mapPartitions decoder slot is deterministic and covers every doc") {
    val decoded = Multimodal.decodePartitions(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(decoded.length == total)
    assert(decoded.forall(f => f.width >= 64 && f.checksum.length == 32))
    val again = Multimodal.decodePartitions(spark, sf).collect()
    assert(decoded.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }
}
