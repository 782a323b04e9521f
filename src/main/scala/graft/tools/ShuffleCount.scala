package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the Exchange (shuffle) and BroadcastExchange counts of every
  * batch query's physical plan — the raw data behind the shuffle
  * budgets ShuffleBudgetSpec pins. */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_") && !Set("es_live_store", "es_live_compaction").contains(name)) {
        try {
          // ops that cache() shared frames leave InMemoryRelations whose
          // cached plans print inline and double-count later queries'
          // exchanges — clear before every capture (the CLAUDE.md gotcha
          // ShuffleBudgetSpec guards against)
          spark.sharedState.cacheManager.clearCache()
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val sh = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
            "Exchange SinglePartition").map(p => p.r.findAllIn(plan).length).sum
          val reused = "ReusedExchange".r.findAllIn(plan).length
          val bc = "BroadcastExchange".r.findAllIn(plan).length
          println(s"SHUF $name shuffles=$sh reused=$reused broadcasts=$bc")
        } catch { case e: Throwable => println(s"SHUF $name ERROR ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
