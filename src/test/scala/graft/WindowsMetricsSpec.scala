package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

class WindowsMetricsSpec extends SparkSpec {

  test("tumbling windows partition all events exactly once") {
    val total = Tables.events(spark, sf).count()
    val windowed = run("win_tumbling").agg(sum("n")).collect()(0).getLong(0)
    assert(windowed == total)
  }

  test("sliding 2h/1h windows count every event exactly twice") {
    val total = Tables.events(spark, sf).count()
    val windowed = run("win_sliding").agg(sum("n")).collect()(0).getLong(0)
    assert(windowed == 2 * total)
  }

  test("session windows partition all events, gaps >= 30 min between sessions") {
    val total = Tables.events(spark, sf).count()
    val sess = run("win_session").collect()
    assert(sess.map(_.getAs[Long]("sess_n")).sum == total)
    // consecutive sessions of the same user start >= 30 min apart
    sess.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
      val starts = ss.map(_.getAs[Long]("sess_start_s")).sorted
      starts.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= 1800)
        case _           =>
      }
    }
  }

  test("metric_ewma matches sequential surge-style recurrence") {
    // recompute for every user with the literal surge loop:
    // seed with first value, then e = e*w + v*(1-w), w = 0.5
    val evs = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expected = evs.groupBy(_._1).view.mapValues { rows =>
      val last20 = rows.sortBy(r => (r._2, r._3)).takeRight(20).map(_._4)
      last20.tail.foldLeft(last20.head)((e, v) => e * 0.5 + v * 0.5)
    }.toMap
    run("metric_ewma").collect().foreach { r =>
      val uid = r.getAs[Long]("user_id")
      assert(math.abs(r.getAs[Double]("ewma") - expected(uid)) < 1e-6,
        s"user $uid")
    }
  }

  test("metric_stats last value equals the latest reading per sensor") {
    val evs = Tables.events(spark, sf)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expected = evs.groupBy(_._1).view.mapValues(_.maxBy(e => (e._2, e._3))._4).toMap
    run("metric_stats").collect().foreach { r =>
      assert(r.getAs[Double]("last_v") == expected(r.getAs[String]("event_type")))
    }
  }

  test("signal_threshold only fires with >= 2 errors in the hour") {
    run("signal_threshold").collect().foreach(r => assert(r.getAs[Long]("n") >= 2))
  }

  test("distinct_approx is within 5% of exact") {
    val exact = run("distinct_exact").select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    run("distinct_approx").collect().foreach { r =>
      val e = exact(r.getAs[String]("event_type")).toDouble
      assert(math.abs(r.getAs[Long]("n_users_approx") - e) / e <= 0.05)
    }
  }

  test("text_tokens whitespace count matches manual split") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    run("text_tokens").collect().take(50).foreach { r =>
      assert(r.getAs[Long]("n_ws") == texts(r.getAs[Long]("doc_id")).split(" ", -1).length)
    }
  }
}
