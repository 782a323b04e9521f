package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties}
import graft.api.{Account, AccountModel}
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
}
