package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The data-contract CANARY: pins the post-normalization schema of
  * every driver table, column by column, so a testdata regeneration
  * that drifts a physical type (the r6 incident: events.ts silently
  * moved TIMESTAMP(NANOS) → TIMESTAMP_NTZ micros and took 14 operators
  * down at analysis time) fails HERE with the drifted column named —
  * not as a scatter of DATATYPE_MISMATCH errors across 14 operators.
  *
  * Contract notes:
  *  - events is read through [[Tables.events]], whose normalizeTs maps
  *    every known physical arrival (int64 nanos, µs-NTZ, µs-UTC) to
  *    TimestampType — the one type watermarks and unix_micros accept.
  *  - o_orderdate / l_shipdate load raw; the current generation ships
  *    them as TIMESTAMP_NTZ, which every consumer treats as a calendar
  *    value (truncation/comparison only — value-identical under the
  *    UTC session), so NTZ is pinned as their contract type.
  */
class DataContractSpec extends SparkSpec {

  private def check(table: String, expect: Seq[(String, DataType)]): Unit = {
    val df = if (table == "events") Tables.events(spark, sf)
             else Tables.load(spark, sf, table)
    val got = df.schema.map(f => f.name -> f.dataType)
    expect.foreach { case (name, dt) =>
      val actual = got.toMap.get(name)
      assert(actual.contains(dt),
        s"CONTRACT DRIFT in $table.$name: expected $dt, loaded ${actual.getOrElse("<missing>")} — " +
          "the driver regenerated testdata with a new physical type; " +
          "fix Tables.normalizeTs (events.ts) or re-pin this contract")
    }
    assert(got.map(_._1) == expect.map(_._1),
      s"CONTRACT DRIFT in $table: column set/order ${got.map(_._1)} != ${expect.map(_._1)}")
  }

  test("all ten tables match the pinned post-normalization contract") {
    check("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    check("nation", Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    check("customer", Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    check("supplier", Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    check("part", Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    check("orders", Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    check("lineitem", Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    check("events", Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    check("documents", Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    check("embeddings", Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("events.ts normalization preserves microsecond precision and epoch range") {
    val r = Tables.events(spark, sf)
      .agg(max(pmod(Tables.microsOf(col("ts")), lit(1000000L))).as("sub_us"),
        min(Tables.microsOf(col("ts"))).as("min_us"),
        max(Tables.microsOf(col("ts"))).as("max_us"))
      .collect()(0)
    assert(r.getLong(0) > 0L,
      "sub-second microseconds were lost in ts normalization — Packed tie-breaks depend on them")
    // the generated window is post-2024, pre-2100 — a unit slip
    // (ms-as-µs, s-as-µs) lands orders of magnitude outside this band
    assert(r.getLong(1) > 1704067200000000L && r.getLong(2) < 4102444800000000L,
      s"events.ts epoch-µs band [${r.getLong(1)}, ${r.getLong(2)}] outside 2024..2100 — unit drift in normalization")
  }

  test("value survives the cents round-trip exactly") {
    val bad = Tables.events(spark, sf)
      .filter(abs(Tables.cents(col("value")).cast("double") / 100.0 - col("value")) > 1e-9)
      .count()
    assert(bad == 0L, s"$bad event values are not 2-decimal money — cents() exactness broken")
  }

  test("streaming split source carries TimestampType event time") {
    val split = graft.streaming.Streams.eventStream(spark, sf).schema
    assert(split("ts").dataType == TimestampType,
      s"stream schema ts is ${split("ts").dataType} — watermarks require TimestampType")
  }

  test("kafka wire and value-envelope schemas match the pinned contract") {
    import graft.streaming.KafkaWire
    // the connector's record shape — every spark-sql-kafka version has
    // shipped exactly these seven columns in this order
    assert(KafkaWire.wireSchema.map(f => f.name -> f.dataType) == Seq(
      "key" -> BinaryType, "value" -> BinaryType, "topic" -> StringType,
      "partition" -> IntegerType, "offset" -> LongType,
      "timestamp" -> TimestampType, "timestampType" -> IntegerType))
    // the value envelope IS the C3/E9 event envelope
    assert(KafkaWire.envelopeSchema.map(f => f.name -> f.dataType) == Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType))
    // and the decoder output equals the typed stream contract every
    // stream_* operator consumes
    import org.apache.spark.sql.Encoders
    assert(Encoders.product[graft.streaming.Ev].schema
      .map(f => f.name -> f.dataType) ==
      KafkaWire.envelopeSchema.map(f => f.name -> f.dataType))
  }
}
