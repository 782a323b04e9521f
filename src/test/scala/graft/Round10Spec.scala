package graft

import org.apache.spark.sql.functions._

/** Round 10 fixes.
  *
  * Tiling sizer overflow (VERDICT r9 "what's wrong" #2): the D5
  * block-pair sizer squared a LongType count in int64 — past
  * cnt ≈ 3.04e9 the square wraps negative under non-ANSI semantics and
  * g silently collapses to 1 task, reverting the hot bucket to a
  * single-core grind at exactly the degenerate scale the tiling path
  * exists for. The sizer now squares in Double and caps at (cnt,
  * Int.MaxValue).
  */
class Round10Spec extends SparkSpec {

  private def g(cnt: Long, budget: Double = 2e7): Long = {
    import spark.implicits._
    Seq(cnt).toDF("cnt")
      .select(graft.functions.Dedup.tileBlocks(col("cnt"), budget).cast("long"))
      .head.getLong(0)
  }

  test("tileBlocks holds pairs-per-task at the budget across scales") {
    // the budget fixes the BLOCK SIZE: g = ceil(c/√budget), so a
    // block-pair task scores (c/g)² ≈ budget pairs at ANY bucket size.
    // (The r9 sizer g = ceil(c²/budget) oversplit quadratically: the
    // sf100 profile's 113k-row bucket got 649 blocks and ~325× input
    // replication — ~35 GB of band-join shuffle where 26 blocks ship
    // ~13×.)
    for (c <- Seq(5000L, 20000L, 113864L, 1000000L, 100000000L)) {
      val blocks = g(c)
      val pairsPerTask = (c.toDouble / blocks) * (c.toDouble / blocks)
      assert(pairsPerTask <= 2e7 * 1.05,
        s"c=$c g=$blocks pairs/task=$pairsPerTask over budget")
      assert(blocks <= math.ceil(c / math.sqrt(2e7)).toLong,
        s"c=$c oversplit: g=$blocks")
    }
    // the sf100 measured hot bucket: 113,864 rows -> 26 blocks, ~19M
    // pairs per block-pair task
    assert(g(113864L) == 26L)
    // healthy bucket under budget: 1 block (single-task join)
    assert(g(1000L) == 1L)
    assert(g(0L) >= 1L) // never zero or negative
  }

  test("tileBlocks cannot wrap or collapse at degenerate bucket sizes") {
    // no squaring anywhere: 4e9 rows -> ceil(4e9/4472) ≈ 894k blocks,
    // positive, monotone, far under the Int.MaxValue cap
    val huge = g(4000000000L)
    assert(huge == math.ceil(4e9 / math.sqrt(2e7)).toLong, s"got $huge")
    assert(g(3000000000L) <= g(3100000000L) && g(3100000000L) <= huge)
  }

  test("tileBlocks is capped by the row count itself") {
    // a tiny budget cannot demand more blocks than rows
    assert(g(5L, budget = 0.5) == 5L)
  }

  // ---- bucket-local contraction (the round-10 scale-killer fix) ----
  //
  // contractPairs replaces each task's pair stream with a spanning
  // star of its local components. The equivalence claim: for ANY
  // partitioning of ANY edge list, components(contract(E)) ==
  // components(E). The driver oracle re-proves it at data scale
  // (the recursive-CTE closure still reads the FULL pair set); these
  // properties prove it structurally.

  private def labelsOf(edges: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import org.apache.spark.sql.Row
    graft.functions.Clusters.components(edges).collect()
      .map { case Row(n: Long, l: Long) => (n, l) }.toSet
  }

  test("contraction preserves connected components on random graphs at arbitrary partitionings") {
    import spark.implicits._
    for (seed <- Seq(1, 42)) {
      val rnd = new scala.util.Random(seed)
      // mixed shape: sparse random edges + a planted clique + chains
      val sparse = Seq.fill(250)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      val clique = for { a <- 400 until 430; b <- a + 1 until 430 } yield (a.toLong, b.toLong)
      val chain = (500 until 540).map(i => (i.toLong, i.toLong + 1))
      val edges = (sparse ++ clique ++ chain)
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val df = edges.toDF("doc_a", "doc_b")
      val parts = 3 + rnd.nextInt(6)
      val direct = labelsOf(df)
      val contracted = labelsOf(
        graft.functions.Dedup.contractPairs(df.repartition(parts), "doc_a", "doc_b"))
      assert(direct == contracted, s"seed=$seed parts=$parts")
    }
  }

  test("contraction collapses a clique's explicit pair set to O(nodes) edges per task") {
    import spark.implicits._
    val n = 120
    val clique = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
    val df = clique.toDF("doc_a", "doc_b").repartition(5)
    val contracted = graft.functions.Dedup.contractPairs(df, "doc_a", "doc_b").cache()
    val cnt = contracted.count()
    // per task: ≤ nodes−1 star edges → ≤ 5·(n−1) total, vs C(n,2)=7140
    assert(cnt <= 5L * (n - 1), s"contracted to $cnt edges")
    // connectivity survives: one component labeled by the min node
    val labs = labelsOf(contracted)
    assert(labs.map(_._2) == Set(0L) && labs.map(_._1).size == n)
    contracted.unpersist()
    ()
  }

  test("contraction emits no pair the input graph does not connect (no spurious merges)") {
    import spark.implicits._
    // two disjoint cliques split across partitions must stay disjoint
    val c1 = for { a <- 0 until 40; b <- a + 1 until 40 } yield (a.toLong, b.toLong)
    val c2 = for { a <- 100 until 140; b <- a + 1 until 140 } yield (a.toLong, b.toLong)
    val df = (c1 ++ c2).toDF("doc_a", "doc_b").repartition(7)
    val labs = labelsOf(graft.functions.Dedup.contractPairs(df, "doc_a", "doc_b"))
    assert(labs.map(_._2) == Set(0L, 100L))
    assert(labs.filter(_._2 == 0L).map(_._1) == (0L until 40L).toSet)
    assert(labs.filter(_._2 == 100L).map(_._1) == (100L until 140L).toSet)
  }

  test("components evaluates its edge input exactly once (nondeterministic contraction safety)") {
    // A contracted edge stream's content is partitioning-dependent:
    // evaluating it twice can yield two DIFFERENT valid spanning
    // stars, and union(e, swap(e)) over two materializations builds
    // an ASYMMETRIC graph that silently loses connectivity (the
    // cold-cache dedup_clusters parity failure this pins). components
    // must value-pin its input — exactly one evaluation.
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("edgeEvals")
    val edges = Seq((2L, 1L), (3L, 2L), (5L, 4L)).toDS()
      .repartition(3)
      .mapPartitions { it => acc.add(1L); it }
      .toDF("doc_a", "doc_b")
    val labs = graft.functions.Clusters.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    assert(acc.value == 3L,
      s"edge input evaluated ${acc.value / 3} times (accumulator ${acc.value}, 3 partitions)")
  }
}
