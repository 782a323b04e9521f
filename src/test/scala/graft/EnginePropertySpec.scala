package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties}
import graft.api.{Account, AccountModel, InvEvent, Inventory, InventoryModel}
import graft.streaming.Streams
import graft.streaming.Ev

/** Property-based checks of the fold semantics (no Spark needed — the
  * model callbacks are plain Scala, which is the point of the API). */
object EnginePropertySpec extends Properties("graft.engine") {

  private val genEv: Gen[Ev] = for {
    id <- Gen.choose(0L, 1000000L)
    min <- Gen.choose(0, 10000)
    uid <- Gen.choose(1L, 5L)
    t <- Gen.oneOf("signup", "purchase", "click", "view", "error")
    v <- Gen.choose(0, 30000).map(_ / 100.0)
  } yield Ev(id, new Timestamp(1704067200000L + min * 60000L), uid, t, v)

  property("fold insensitive to arrival order") =
    Prop.forAll(Gen.listOfN(40, genEv), Gen.choose(0L, 100L)) { (evs, seed) =>
      val a = Streams.applyEvents(1L, None, evs)
      val b = Streams.applyEvents(1L, None, new scala.util.Random(seed).shuffle(evs))
      a == b
    }

  property("fold incremental: fold(all) == fold(fold(prefix), suffix)") =
    Prop.forAll(Gen.listOfN(30, genEv), Gen.choose(0, 30)) { (evs, cut0) =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val cut = math.min(cut0, sorted.length)
      val (pre, post) = sorted.splitAt(cut)
      val whole = Streams.applyEvents(1L, None, sorted)
      val staged =
        if (pre.isEmpty) Streams.applyEvents(1L, None, post)
        else Streams.applyEvents(1L, Some(Streams.applyEvents(1L, None, pre)), post)
      whole == staged
    }

  property("n_events equals number of applied events") =
    Prop.forAll(Gen.nonEmptyListOf(genEv)) { evs =>
      val st = evs.foldLeft(Option.empty[Account])(AccountModel.applyEvent)
      st.get.n_events == evs.length
    }

  property("purchases accepted iff covered; non-purchases always pass") =
    Prop.forAll(genEv, Gen.choose(-2000L, 2000L)) { (cmd, bal) =>
      val res = AccountModel.handleCommand(Some(Account(bal, 0, 1)), cmd)
      if (cmd.event_type != "purchase") res.isRight
      else res.isRight == (bal >= math.round(cmd.value * 100))
    }

  // ---- the SECOND model (InventoryModel) through the same engine
  // contract: the fold laws must hold for ANY AggregateModel, so each
  // is restated over inventory events — the suite is parameterized
  // over both models, not Account-shaped.

  private def invFold(evs: Seq[InvEvent]): Option[Inventory] =
    evs.sortBy(InventoryModel.eventSequence)
      .foldLeft(Option.empty[Inventory])(InventoryModel.applyEvent)

  private val genInvEv: Gen[InvEvent] = for {
    ev <- genEv
  } yield InventoryModel.toEvent(ev)

  property("inventory fold insensitive to arrival order") =
    // the RIGHT side folds the shuffled list AS-IS (no sortBy) — with
    // both sides sorting first, shuffling is undone before the fold
    // and the property never exercises commutativity of applyEvent
    Prop.forAll(Gen.listOfN(40, genInvEv), Gen.choose(0L, 100L)) { (evs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      invFold(evs) == shuffled.foldLeft(Option.empty[Inventory])(InventoryModel.applyEvent)
    }

  property("inventory fold incremental: fold(all) == fold(fold(prefix), suffix)") =
    Prop.forAll(Gen.listOfN(30, genInvEv), Gen.choose(0, 30)) { (evs, cut0) =>
      val sorted = evs.sortBy(InventoryModel.eventSequence)
      val cut = math.min(cut0, sorted.length)
      val (pre, post) = sorted.splitAt(cut)
      val staged = post.foldLeft(invFold(pre))(InventoryModel.applyEvent)
      invFold(sorted) == staged
    }

  property("inventory n_events equals number of applied events") =
    Prop.forAll(Gen.nonEmptyListOf(genInvEv)) { evs =>
      invFold(evs).get.n_events == evs.length
    }

  property("reserve accepted iff available covers it; reorder iff it drains below low water") =
    Prop.forAll(genEv, Gen.choose(0L, 30000L), Gen.choose(0L, 30000L)) { (ev, oh, rv0) =>
      val cmd = ev.copy(event_type = "purchase")
      val rv = math.min(rv0, oh) // a coherent ledger never over-reserves
      val q = math.round(cmd.value * 100)
      InventoryModel.handleCommand(Some(Inventory(oh, rv, 1)), cmd) match {
        case Left(_) => oh - rv < q
        case Right(evs) =>
          oh - rv >= q &&
            evs.map(_.kind) == (
              if (oh - (rv + q) < InventoryModel.lowWater) Seq("reserve", "reorder")
              else Seq("reserve"))
      }
    }

  property("inquiries are accepted with zero events; ship/release gate on reservations") =
    Prop.forAll(genEv, Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)) { (ev, oh, rv) =>
      val q = math.round(ev.value * 100)
      val st = Some(Inventory(oh, rv, 1))
      (InventoryModel.handleCommand(st, ev.copy(event_type = "view")) == Right(Seq.empty)) &&
        (InventoryModel.handleCommand(st, ev.copy(event_type = "click")).isRight == (rv >= q)) &&
        (InventoryModel.handleCommand(st, ev.copy(event_type = "error")).isRight == (rv >= q))
    }

  property("accepted events replay to the state the command handler saw") =
    Prop.forAll(Gen.listOfN(20, genEv)) { cmds =>
      // engine invariant across ANY model: applying handleCommand's
      // emitted events (the applySequentially loop) yields a state
      // whose ledger is internally coherent — shipped stock never
      // exceeds what was on hand, reservations never go negative
      val sorted = cmds.sortBy(InventoryModel.commandSequence)
      val fin = sorted.foldLeft(Option.empty[Inventory]) { (st, c) =>
        InventoryModel.handleCommand(st, c) match {
          case Right(evs) => evs.foldLeft(st)(InventoryModel.applyEvent)
          case Left(_)    => st
        }
      }
      fin.forall(s => s.reserved_c >= 0 && s.on_hand_c >= s.reserved_c)
    }
}
