package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (when SQL-expressible) a
  * DuckDB oracle over the same tables. Column names/types must match the
  * oracle exactly — the driver hash-compares values after sorting
  * columns by name. */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait OpFamily {
  def ops: Seq[Op]
}
