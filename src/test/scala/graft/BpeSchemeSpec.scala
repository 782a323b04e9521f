package graft

import org.apache.spark.sql.functions._

/** The delimiter-replace BPE scheme (T15) against a reference
  * symbol-vector implementation, on ADVERSARIAL vocabularies — chains
  * of repeated characters and overlapping patterns are exactly where
  * string-replace tokenization schemes silently diverge from greedy
  * BPE (shared-boundary matches, rescanned replacements). The corpus
  * spec (Round5dSpec) proves equality on real data; this one proves
  * the scheme itself. */
class BpeSchemeSpec extends SparkSpec {

  /** Reference greedy BPE: learn `merges` merges over (word, freq),
    * return each word's token count. Pure Scala symbol vectors. */
  private def referenceBpe(vocab: Seq[(String, Long)], merges: Int): Map[String, Long] = {
    var symsOf: Map[String, Vector[String]] =
      vocab.map { case (w, _) => w -> w.split("").toVector }.toMap
    val wf = vocab.toMap
    for (_ <- 1 to merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- symsOf; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += wf(w)
      if (pc.nonEmpty) {
        val p = pc.toSeq.minBy { case ((a, b), n) => (-n, a + " " + b) }._1
        symsOf = symsOf.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
              out += (p._1 + p._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    symsOf.map { case (w, s) => w -> s.length.toLong }
  }

  private def check(vocab: Seq[(String, Long)], merges: Int, label: String): Unit = {
    val df = spark.createDataFrame(vocab).toDF("w", "wf")
    val got = graft.functions.TextAnalysis.bpeLearnEncode(df, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = referenceBpe(vocab, merges)
    assert(got == expect, s"$label: scheme=$got reference=$expect")
  }

  test("repeated-char chains: greedy non-overlapping application") {
    // merge (a,a) over odd/even runs — the classic off-by-one trap:
    // [a,a,a] must become [aa,a], never [a,aa] or [aa,aa]
    check(Seq("aaaa" -> 3L, "aaa" -> 2L, "aa" -> 5L, "a" -> 1L,
      "aaaaaaa" -> 1L), merges = 3, "runs of a")
  }

  test("overlapping alternations and shared boundaries") {
    check(Seq("ababab" -> 4L, "aba" -> 3L, "bab" -> 3L, "abba" -> 2L,
      "baab" -> 2L), merges = 4, "ab alternations")
    check(Seq("abcabc" -> 5L, "abc" -> 4L, "bca" -> 3L, "cab" -> 2L),
      merges = 4, "abc rotations")
  }

  test("multi-char symbols must not match across boundaries") {
    // after (a,b)→ab wins, a pair like (b,c) must not match the 'b'
    // inside symbol "ab"; after (ab,c)→abc, 'bc' likewise
    check(Seq("abcd" -> 6L, "abc" -> 5L, "bcd" -> 4L, "ab" -> 3L,
      "cd" -> 3L), merges = 4, "boundary safety")
  }

  test("randomized vocabularies match the reference exactly") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 20).map { _ =>
        val len = 1 + rnd.nextInt(10)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(5))
      }.distinctBy(_._1)
      check(vocab, merges = 4, s"seed $seed")
    }
  }
}
