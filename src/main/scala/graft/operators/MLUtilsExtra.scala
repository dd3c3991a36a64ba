package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small mllib utility surface (reference mllib/src/main/scala/org/
  * apache/spark/mllib/util/DataValidators.scala:1 and
  * mllib/rdd/RDDFunctions.scala:1 `sliding`), re-expressed declaratively.
  */
object MLUtilsExtra {

  /** DataValidators.binaryLabelValidator parity: true iff every value of
    * `labelCol` is exactly 0.0 or 1.0 — ONE bounded count aggregate, no
    * collect of rows. A NULL label is invalid (the reference's validator
    * runs on non-null doubles, so a null here is a data error — without
    * the isNull arm the three-valued filter predicate would silently
    * drop the row and report valid). */
  def binaryLabelValid(df: DataFrame, labelCol: String): Boolean = {
    val l = col(labelCol)
    df.filter(l.isNull || (l =!= 0.0 && l =!= 1.0)).isEmpty
  }

  /** DataValidators.multiLabelValidator(k) parity: true iff every label
    * is an integer in {0, …, k−1}; NULL labels invalid (see above). */
  def multiLabelValid(df: DataFrame, labelCol: String, k: Int): Boolean = {
    val l = col(labelCol)
    df.filter(l.isNull || l =!= floor(l) || l < 0 || l > k - 1).isEmpty
  }

  /** RDDFunctions.sliding(windowSize) parity over an EXPLICIT ordering:
    * returns (plus the original columns) an array of the next
    * `windowSize` values of `valueCol` in `orderCol` order, rows whose
    * window would run off the end dropped — the reference's "empty if
    * fewer than windowSize items" contract, cross-partition stitching
    * included. The reference implements this with a custom SlidingRDD
    * that ships each partition's head to its predecessor; Spark's
    * window frame (`ROWS BETWEEN CURRENT AND n-1 FOLLOWING`) IS that
    * operator, planned with range-partitioned sort — no custom RDD
    * needed, and at scale the exchange is the same single sort shuffle
    * the reference's ordering already implies. Pass a `partitionCol` to
    * window per group (no global sort) — the form a 100 TB pipeline
    * should prefer; the global form exists for strict parity. */
  def sliding(df: DataFrame, orderCol: Column, valueCol: Column, windowSize: Int,
              partitionCol: Option[Column] = None): DataFrame = {
    require(windowSize > 0, s"window size must be positive, got $windowSize")
    import org.apache.spark.sql.expressions.Window
    val base = partitionCol.fold(Window.orderBy(orderCol))(p =>
      Window.partitionBy(p).orderBy(orderCol))
    val w = base.rowsBetween(Window.currentRow, windowSize - 1)
    df.withColumn("window", collect_list(valueCol).over(w))
      .filter(size(col("window")) === windowSize)
  }
}
