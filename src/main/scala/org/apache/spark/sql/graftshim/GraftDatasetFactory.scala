package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridges a hand-built LogicalPlan into a public DataFrame.
  *
  * `Dataset.ofRows` is private[sql], so this one-line shim lives under the
  * org.apache.spark.sql namespace — the standard pattern for third-party
  * plan extensions (cf. retrieved public snippets of DatasetFactory
  * wrappers in SNIPPETS.md [1], [3]). Nothing else in graft touches
  * non-public Spark API.
  */
object GraftDatasetFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
