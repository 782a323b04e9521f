package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Round 12 additions — the four new scale-first pipeline operators.
  *
  * T22 `vocab_heavy_hitters` rests on the Misra-Gries pigeonhole
  * guarantee: a capacity-c summary computed independently inside each
  * partition retains every token whose GLOBAL frequency exceeds
  * N/(c+1), under ANY partitioning of the stream. The final exact
  * recount + threshold filter then erases the partitioning-dependence
  * of the candidate set. These tests pin both halves: the superset
  * property across adversarial partitionings (skewed, uniform,
  * singleton-heavy streams), and end-to-end equality with the
  * brute-force groupBy answer.
  *
  * T23 / P20 pin the salted-hash sampling contracts (fixed-count
  * uniform sample; per-domain cap) against independently computed
  * brute-force answers, plus the plan shapes that make them scale:
  * two-phase TopK for the global sample (no window, no global sort),
  * one TopKPerKey for the cap (no per-source sort).
  *
  * P19 pins the decile law: decile(doc) = (10 · |docs strictly
  * shorter|) div N — exact, tie-stable, recomputed row-by-row here.
  */
class Round12Spec extends SparkSpec {

  import spark.implicits._

  private def bruteHH(tokens: Seq[String]): Map[String, Long] = {
    val n = tokens.size.toLong
    tokens.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 65 > n }.toMap
  }

  test("Misra-Gries per-partition summary retains every global heavy hitter (superset guarantee)") {
    val rnd = new scala.util.Random(12)
    for (trial <- 0 until 4; parts <- Seq(1, 3, 7)) {
      // skewed stream: a few hot tokens + a long singleton tail
      val hot = (0 until 3).flatMap(i => Seq.fill(2000 * (i + 1))(s"hot$i"))
      val tail = (0 until 5000).map(i => s"t${trial}_$i")
      val tokens = rnd.shuffle(hot ++ tail)
      val df = tokens.toDF("token").repartition(parts)
      val candidates = TextAnalysis.mgSummary(df)
        .select("token").as[String].collect().toSet
      val n = tokens.size.toLong
      val mustKeep = bruteHH(tokens).keySet
      assert(mustKeep.nonEmpty, "fixture produced no heavy hitters")
      val missed = mustKeep.diff(candidates)
      assert(missed.isEmpty,
        s"trial $trial parts $parts: MG lost heavy hitters $missed (n=$n)")
    }
  }

  test("vocab_heavy_hitters end-to-end equals brute force, independent of partitioning") {
    val rnd = new scala.util.Random(34)
    val hot = (0 until 4).flatMap(i => Seq.fill(1000 * (i + 1))(s"h$i"))
    val tail = (0 until 8000).map(i => s"w$i")
    val tokens = rnd.shuffle(hot ++ tail)
    val expect = bruteHH(tokens).toSeq.sorted
    for (parts <- Seq(2, 5)) {
      val got = TextAnalysis.heavyHittersOf(tokens.toDF("token").repartition(parts))
        .as[(String, Long)].collect().toSeq.sorted
      assert(got == expect, s"parts=$parts")
    }
  }

  test("vocab_heavy_hitters on the corpus equals the brute-force token count") {
    val tokens = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").as[String].collect().toSeq
    val expect = bruteHH(tokens).toSeq.sorted
    val got = run("vocab_heavy_hitters").as[(String, Long)].collect().toSeq.sorted
    assert(got == expect)
  }

  test("sample_uniform equals the brute-force bottom-k and plans two-phase, sort- and window-free") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("cast(conv(substr(md5(concat('usample:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expect = docs.sortBy(t => (t._4, t._1)).take(100).toSet
    val df = run("sample_uniform")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expect)
    // AQE prints the initial plan after the final one — count only the final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("TopKPerKey".r.findAllIn(plan).length == 2,
      s"expected the two-phase TopK pair:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("TakeOrdered"),
      s"sample must not rank via window or driver-side ordered take:\n$plan")
  }

  test("corpus_domain_cap keeps exactly the k hash-smallest docs of each source, sort-free") {
    val k = 15
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        expr("cast(conv(substr(md5(concat('cap:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).values
      .flatMap(_.sortBy(t => (t._3, t._1)).take(k)).toSet
    val df = run("corpus_domain_cap")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("WindowExec"),
      s"cap must rank via the heap operator, not a per-source sort:\n$plan")
  }

  test("corpus_deciles assigns (10 * |strictly shorter|) div N, exactly") {
    val lens = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = lens.length.toLong
    val below = lens.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).view.mapValues(_.map(_._2.toLong).min).toMap
    val expect = lens.map { case (id, len) => (id, len, 10L * below(len) / n) }.toSet
    val got = run("corpus_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.map(_._3).forall(d => d >= 0 && d <= 9))
  }
}
