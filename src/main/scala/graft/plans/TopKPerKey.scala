package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Top-K-per-key as a first-class physical operator.
  *
  * The compositional form (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`) fully SORTS every key's partition — at 100 TB
  * that is a massive sort for a result that only needs the k best rows
  * per key. This operator keeps one bounded k-heap per key after the
  * shuffle: O(n·log k) with O(keys·k) memory, no sort buffers, no
  * spill pressure from ordering.
  *
  * Wiring: logical node → strategy (via
  * `spark.experimental.extraStrategies`) → exec node that declares
  * `ClusteredDistribution(key)` so EnsureRequirements inserts the one
  * hash shuffle.
  *
  * Ranking is (score DESC, tie ASC), both int64 — exact, deterministic,
  * engine-neutral (same contract as the oracle's window form).
  */
final case class TopKPerKeyNode(
    k: Int, key: Expression, score: Expression, tie: Expression,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, key, score, tie, child) =>
      TopKPerKeyExec(k, key, score, tie, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int, key: Expression, score: Expression, tie: Expression,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // one hash shuffle on the key — EnsureRequirements inserts it
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(key :: Nil) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val schema = child.output
    val keyLocal = key
    val scoreLocal = score
    val tieLocal = tie
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(Seq(keyLocal), schema)
      val rankProj = UnsafeProjection.create(Seq(scoreLocal, tieLocal), schema)
      // per-key bounded heap of (score, tie, row); worst element on top
      // so insertion beyond k evicts the current worst
      // PriorityQueue dequeues the ordering's MAX; (-score, tie) makes
      // the max element the WORST (lowest score, highest tie) so
      // insertion beyond k evicts it
      implicit val worstFirst: Ordering[(Long, Long, UnsafeRow)] =
        Ordering.by[(Long, Long, UnsafeRow), (Long, Long)](t => (-t._1, t._2))
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(Long, Long, UnsafeRow)]]
      iter.foreach { row =>
        val kr = keyProj(row)
        val rank = rankProj(row)
        val entry = (rank.getLong(0), rank.getLong(1), row.asInstanceOf[UnsafeRow].copy())
        heaps.get(kr) match {
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(entry)
            else {
              val worst = h.head
              // better = higher score, or equal score with lower tie
              if (entry._1 > worst._1 || (entry._1 == worst._1 && entry._2 < worst._2)) {
                h.dequeue(); h.enqueue(entry)
              }
            }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[(Long, Long, UnsafeRow)]
            h.enqueue(entry)
            heaps.put(kr.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopK {
  /** Keep each key's k best rows by (score DESC, tie ASC); both rank
    * columns must be int64. */
  def topKPerKey(df: DataFrame, k: Int, key: String, scoreDesc: String, tieAsc: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def resolve(name: String): Expression =
      analyzed.output.find(_.name == name)
        .getOrElse(sys.error(s"cannot resolve $name among ${analyzed.output.map(_.name)}"))
    ColumnBridge.dataFrame(spark,
      TopKPerKeyNode(k, resolve(key), resolve(scoreDesc), resolve(tieAsc), analyzed))
  }
}
