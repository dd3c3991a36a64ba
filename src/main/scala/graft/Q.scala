package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator/query: a Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle over the same
  * parquet tables. Column names and row order must match between the two
  * (the driver sorts columns by name and hash-compares values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
