package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-path stage breakdown for the D2/D3 pipeline. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.lineitem(spark, sfDir).count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val sh = tok.select(col("doc_id"), explode(transform(
      sequence(lit(1), size(col("t")) - 2),
      i => concat_ws(" ", slice(col("t"), i, lit(3))))).as("s"))
    time("shingle count")(sh.count())
    val ab = sh.select(col("doc_id"), md5(col("s")).as("h"))
      .select(col("doc_id"),
        expr("cast(conv(substr(h, 1, 8), 16, 10) as bigint)").as("a"),
        expr("cast(conv(substr(h, 9, 8), 16, 10) as bigint)").as("b"))
    time("md5+conv count")(ab.count())
    val hashAggs = (0 until 16).map(j => min(col("a") + lit(j.toLong) * col("b")).as(s"h$j"))
    val mh = ab.groupBy("doc_id").agg(hashAggs.head, hashAggs.tail: _*)
    time("minhash agg")(mh.count())
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(r => col(s"h${b * 4 + r}").cast("string")): _*)).as("bh"))
    }
    val bands = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh")).cache()
    time("bands materialize")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().cache()
    time("cand join")(cand.count())
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val dsh = sh.distinct().join(candDocs, Seq("doc_id"), "left_semi").cache()
    time("dsh distinct+semi")(dsh.count())
    val sz = dsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(dsh.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(dsh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_n"))
    val out = inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
    time("verify joins")(out.count())
    spark.stop()
  }
}
