package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Latest-row-per-key WITHOUT sorting.
  *
  * The obvious `max_by(struct(payload), struct(ts, event_id))` LOOKS
  * like one hash aggregation, but a struct aggregation buffer is not
  * hash-aggregable, so Spark silently falls back to SortAggregate and
  * full-sorts every partition of the log — the exact scale-killer on
  * surge's KTable materialization path
  * (`/root/reference/modules/common/src/main/scala/surge/kafka/streams/AggregateStateStoreKafkaStreams.scala`:
  * latest-state-per-aggregate is a compacted-topic upsert, i.e. an
  * argmax by (timestamp, offset), never a sort).
  *
  * Fix: pack the ordering AND a small payload into ONE decimal(38,0) —
  * a fixed-width, mutable aggregation-buffer type — so the argmax is a
  * plain `max`: map-side partial combine, HashAggregate, no sort, and
  * no join-back to re-attach the payload.
  *
  * Digit budget (38 digits available):
  * {{{
  *   pk = µs(ts) · 10^20  +  event_id · 10^8  +  payload
  *        digits 21..38       digits 9..20       digits 1..8
  * }}}
  *  - µs since epoch ≤ 10^18 covers year 33658;
  *  - event_id < 9.2·10^10 (the long multiply `event_id · 10^8` is the
  *    binding constraint; widen by lifting that multiply into decimal
  *    if an event log ever exceeds ~10^10 ids);
  *  - payload < 10^8 (callers pack e.g. cents·10 + type_code).
  *
  * Fields cannot carry into each other's digits, so ordering by pk is
  * EXACTLY ordering by (ts, event_id) at full microsecond precision —
  * same-second ties (present in the data from sf0.1 up) break on
  * event_id just like the oracle's `ORDER BY ts DESC, event_id DESC`.
  */
object Packed {
  private val D38 = DecimalType(38, 0)
  private val TsShift = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(20))

  /** Base of the payload field: payloads must be in [0, 10^8). */
  val PayloadBase = 100000000L

  /** The packed argmax key; aggregate with plain `max(...)`. */
  def latest(ts: Column, eventId: Column, payload: Column): Column =
    graft.sources.Tables.microsOf(ts).cast(D38) * lit(TsShift) +
      (eventId * lit(PayloadBase) + payload).cast(D38)

  /** Recover the payload from a packed key. */
  def payload(pk: Column): Column =
    pmod(pk, lit(new java.math.BigDecimal(PayloadBase))).cast("long")

  private val EventIdBase = new java.math.BigDecimal(1000000000000L) // 10^12

  /** Recover the event_id (digits 9..20) from a packed key. The
    * subtraction strips the payload digits first so the division is an
    * exact integer quotient (no decimal-scale rounding involved). */
  def eventId(pk: Column): Column =
    pmod(((pk - pmod(pk, lit(new java.math.BigDecimal(PayloadBase))))
      / lit(new java.math.BigDecimal(PayloadBase))).cast(D38),
      lit(EventIdBase)).cast("long")

  /** Recover the epoch-microsecond timestamp (digits 21..38). */
  def micros(pk: Column): Column =
    ((pk - pmod(pk, lit(TsShift))) / lit(TsShift)).cast(D38).cast("long")
}
