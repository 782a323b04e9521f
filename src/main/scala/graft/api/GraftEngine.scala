package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The surge programming model, re-expressed for Spark.
  *
  * Reference (`/root/reference/modules/command-engine/core/src/main/scala/surge/internal/domain/AggregateProcessingModel.scala:17-34`):
  * surge applications implement `SurgeProcessingModel[State, Msg, Event]`
  * with `handle` (command → validate against state → persist events /
  * reject) and `applyAsync` (fold events into state); the engine owns
  * sharding (`hash(aggregateId) % partitions`), state storage (compacted
  * Kafka topic / KTable) and replay.
  *
  * Here the same two callbacks drive three Spark execution modes:
  *  - [[GraftEngine.replayState]] — batch replay of an event log into
  *    per-aggregate state (one shuffle on the aggregate id; events are
  *    ordered within each aggregate before folding, exactly surge's
  *    per-actor ordered delivery);
  *  - [[GraftEngine.processCommands]] — batch command validation
  *    against a state snapshot, emitting accepted events and
  *    rejections (surge `ctx.persistEvents` / `ctx.reject`);
  *  - [[GraftEngine.streamingState]] — continuous state maintenance
  *    with `flatMapGroupsWithState`, the elastic version of surge's
  *    one-PersistentActor-per-aggregate loop.
  */
trait AggregateModel[S, C, E] extends Serializable {
  /** Which aggregate a command routes to (surge's aggregateId). */
  def commandAggregateId(c: C): Long

  /** Which aggregate an event belongs to. */
  def eventAggregateId(e: E): Long

  /** Event ordering within an aggregate (surge: Kafka offset order). */
  def eventSequence(e: E): (Long, Long)

  /** Command ordering within an aggregate (surge: per-actor mailbox
    * arrival order) — commands for one aggregate apply sequentially in
    * this order, each seeing the previous command's state. */
  def commandSequence(c: C): (Long, Long)

  /** surge `handle`: validate a command against current state. */
  def handleCommand(state: Option[S], cmd: C): Either[String, Seq[E]]

  /** surge `applyAsync` (single-event form): fold one event. */
  def applyEvent(state: Option[S], e: E): Option[S]
}

final case class Keyed[S](aggregateId: Long, state: S)
final case class StateBox[S](value: Option[S])
final case class CommandOutcome[C, E](
    aggregateId: Long, command: C, accepted: Boolean,
    rejection: Option[String], events: Seq[E])

class GraftEngine[S, C, E](val model: AggregateModel[S, C, E])(
    implicit es: Encoder[S], ec: Encoder[C], ee: Encoder[E],
    eks: Encoder[Keyed[S]], eco: Encoder[CommandOutcome[C, E]],
    esb: Encoder[StateBox[S]]) extends Serializable {

  private implicit val longEnc: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong

  private def fold(uid: Long, prior: Option[S], evs: Iterator[E]): Option[S] =
    evs.toSeq.sortBy(model.eventSequence)
      .foldLeft(prior)((st, e) => model.applyEvent(st, e))

  /** Batch replay: event log → latest state per aggregate. */
  def replayState(events: Dataset[E]): Dataset[Keyed[S]] =
    events.groupByKey(model.eventAggregateId)
      .flatMapGroups((uid: Long, evs: Iterator[E]) =>
        fold(uid, None, evs).map(Keyed(uid, _)).iterator)

  /** Batch command processing against a state snapshot. Commands for
    * one aggregate are applied sequentially (surge's per-actor mailbox
    * order), each seeing the state produced by the previous one. */
  def processCommands(state: Dataset[Keyed[S]], commands: Dataset[C]): Dataset[CommandOutcome[C, E]] = {
    val keyedCmds = commands.groupByKey(model.commandAggregateId)
    val keyedState = state.groupByKey(_.aggregateId)
    keyedCmds.cogroup(keyedState) { (uid, cmds, st) =>
      applySequentially(uid, st.toSeq.headOption.map(_.state), cmds)._2
    }
  }

  /** Run one aggregate's commands in `commandSequence` order against
    * its state; returns (final state, outcomes). */
  private def applySequentially(
      uid: Long, initial: Option[S], cmds: Iterator[C]): (Option[S], Seq[CommandOutcome[C, E]]) = {
    var current = initial
    val outs: Seq[CommandOutcome[C, E]] = cmds.toSeq.sortBy(model.commandSequence).map { c =>
      model.handleCommand(current, c) match {
        case Right(evs) =>
          current = evs.foldLeft(current)((s, e) => model.applyEvent(s, e))
          CommandOutcome(uid, c, accepted = true, None, evs)
        case Left(rej) =>
          CommandOutcome(uid, c, accepted = false, Some(rej), Seq.empty)
      }
    }
    (current, outs)
  }

  /** CONTINUOUS command processing — surge's actual service loop
    * (`/root/reference/modules/command-engine/core/src/main/scala/surge/internal/persistence/PersistentActor.scala`:
    * commands arrive, are validated against the aggregate's current
    * state, and each is answered with accept + persisted events or
    * reject — `AggregateProcessingModel.scala:17-34` `handle` /
    * `ctx.reject`). The per-aggregate state slot is seeded from a
    * snapshot (surge: KTable restore) and then carried across
    * micro-batches by the state store, so a command in batch N sees the
    * state left by batch N−1 — the streaming twin of
    * [[processCommands]], verified against the same oracle. */
  def streamingCommands(
      commands: Dataset[C], snapshot: Dataset[Keyed[S]]): Dataset[CommandOutcome[C, E]] = {
    val init = snapshot.groupByKey(_.aggregateId)
      .mapValues(k => StateBox(Option(k.state)))(esb)
    commands.groupByKey(model.commandAggregateId)
      .flatMapGroupsWithState[StateBox[S], CommandOutcome[C, E]](
        OutputMode.Update, GroupStateTimeout.NoTimeout, init) {
        (uid: Long, cmds: Iterator[C], gs: GroupState[StateBox[S]]) =>
          val (next, outs) = applySequentially(uid, gs.getOption.flatMap(_.value), cmds)
          gs.update(StateBox(next))
          outs.iterator
      }(esb, eco)
  }

  /** Streaming state maintenance — one state slot per aggregate,
    * sharded by the same hash partitioning surge uses, checkpointed by
    * the state store. */
  def streamingState(events: Dataset[E]): Dataset[Keyed[S]] =
    events.groupByKey(model.eventAggregateId)
      .flatMapGroupsWithState[StateBox[S], Keyed[S]](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[E], gs: GroupState[StateBox[S]]) =>
          val next = fold(uid, gs.getOption.flatMap(_.value), evs)
          gs.update(StateBox(next))
          next.map(Keyed(uid, _)).iterator
      }(esb, eks)
}
