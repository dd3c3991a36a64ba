package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed decision-tree training (reference mllib/src/main/scala/
  * org/apache/spark/mllib/tree/DecisionTree.scala:1) re-expressed
  * Spark-first: MLlib's core trick — bin the features once, then train
  * each LEVEL with ONE aggregation pass that collects per
  * (node, feature, bin, label) counts — maps directly onto a DataFrame
  * groupBy. The driver only ever sees the bounded histogram cube
  * (nodes × features × bins × classes), never rows; split choice is
  * driver-side arithmetic on those counts (the reference's
  * findBestSplits placement, DecisionTree.scala:1136).
  *
  * Rows carry their current node id as a COLUMN (updated per level by a
  * bounded when-chain on the binned feature), so the tree state lives
  * in the data — no shuffling by node, no per-node filtering passes.
  */
object Trees {

  /** One trained split: route bin ≤ thresholdBin left. */
  final case class Split(node: Int, feature: Int, thresholdBin: Int)

  final case class Model(splits: Map[Int, Split], leafClass: Map[Int, String],
                         depth: Int)

  private def gini(counts: Seq[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0 else 1.0 - counts.map(c => (c / n) * (c / n)).sum
  }

  /** Train a depth-`depth` Gini tree over `fts` (array column of `d`
    * doubles, pre-binned here into `bins` fixed-width bins from one
    * global min/max aggregate — deterministic, unlike sampled
    * quantiles) against string label `labelCol`.
    *
    * Per level: one partial-agg groupBy over (node, feature, bin,
    * label) — the posexplode multiplies rows by d (bounded, d tiny) and
    * combines map-side, so the shuffle carries at most
    * nodes·d·bins·classes rows per partition. Ties break (gain desc,
    * feature asc, bin asc) so training is deterministic end-to-end.
    */
  def train(data: DataFrame, fts: Seq[Column], labelCol: Column,
            depth: Int, bins: Int): (DataFrame, Model) = {
    val d = fts.length
    val raw = data.select(array(fts.map(_.cast("double")): _*).as("x"),
      labelCol.cast("string").as("label"))
    val mmExprs = (0 until d).flatMap(j =>
      Seq(min(col("x")(j)).as(s"lo$j"), max(col("x")(j)).as(s"hi$j")))
    val mm = raw.agg(mmExprs.head, mmExprs.tail: _*).head
    val lo = Array.tabulate(d)(j => mm.getDouble(2 * j))
    val hi = Array.tabulate(d)(j => mm.getDouble(2 * j + 1))
    val binCols = (0 until d).map { j =>
      val w = (hi(j) - lo(j)) / bins
      if (w == 0) lit(0)
      else least(floor((col("x")(j) - lit(lo(j))) / lit(w)).cast("int"), lit(bins - 1))
    }
    var df = raw.select(array(binCols: _*).as("b"), col("label"),
      lit(0).as("node")).localCheckpoint()

    var splits = Map.empty[Int, Split]
    var leaves = Map.empty[Int, String]
    for (_ <- 0 until depth) {
      val cube = df.select(col("node"), col("label"),
        posexplode(col("b")).as(Seq("f", "bin")))
        .groupBy("node", "f", "bin", "label").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))
      val byNode = cube.groupBy(_._1)
      val levelSplits = byNode.toSeq.sortBy(_._1).flatMap { case (node, rows) =>
        if (splits.contains(node) || leaves.contains(node)) None
        else {
          val labels = rows.groupBy(_._4).map { case (l, rs) =>
            // feature 0 rows carry each row exactly once
            l -> rs.filter(_._2 == 0).map(_._5).sum
          }
          val total = labels.values.sum
          val parentG = gini(labels.values.toSeq)
          val majority = labels.toSeq.minBy { case (l, c) => (-c, l) }._1
          if (labels.size <= 1) { leaves += node -> majority; None }
          else {
            // best (feature, bin threshold) by Gini gain via prefix scans
            var best: Option[(Double, Int, Int)] = None
            for (f <- 0 until d) {
              val cells = rows.filter(_._2 == f)
              val labelsSeq = labels.keys.toSeq.sorted
              val prefix = scala.collection.mutable.Map(
                labelsSeq.map(_ -> 0L): _*)
              for (t <- 0 until bins - 1) {
                cells.filter(_._3 == t).foreach(r => prefix(r._4) += r._5)
                val left = labelsSeq.map(prefix)
                val nL = left.sum
                if (nL > 0 && nL < total) {
                  val right = labelsSeq.zip(left).map { case (l, c) => labels(l) - c }
                  val g = parentG -
                    (nL.toDouble / total) * gini(left) -
                    ((total - nL).toDouble / total) * gini(right)
                  if (g > 1e-12 && best.forall(b => g > b._1 + 1e-12))
                    best = Some((g, f, t))
                }
              }
            }
            best match {
              case Some((_, f, t)) => Some(Split(node, f, t))
              case None => leaves += node -> majority; None
            }
          }
        }
      }
      if (levelSplits.isEmpty) {
        // nothing left to split — remaining nodes became leaves above
      } else {
        splits ++= levelSplits.map(s => s.node -> s)
        val route = levelSplits.foldLeft(col("node")) { (acc, s) =>
          when(col("node") === s.node,
            lit(s.node * 2 + 1) + (col("b")(s.feature) > s.thresholdBin).cast("int"))
            .otherwise(acc)
        }
        df = df.select(col("b"), col("label"), route.as("node")).localCheckpoint()
      }
    }
    // finalize leaves: majority class of every still-open node
    val finalCounts = df.groupBy("node", "label").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    finalCounts.groupBy(_._1).foreach { case (node, rows) =>
      if (!splits.contains(node) && !leaves.contains(node))
        leaves += node -> rows.map(r => (r._2, r._3)).toSeq
          .minBy { case (l, c) => (-c, l) }._1
    }
    (df, Model(splits, leafClass = leaves, depth))
  }

  /** Registered pass: depth-3 Gini tree predicting `l_returnflag` from
    * (quantity, discount, tax, ship year) — the returnflag is
    * date-driven in TPC-H, so the tree must discover the ship-year
    * split on its own. Output is the bounded per-leaf summary
    * (leaf, rows, predicted class, correct rows); TreesSpec pins exact
    * planted-split recovery, determinism, and the training-accuracy ≥
    * majority-class invariant (which holds by construction for
    * majority-vote leaves). Rows-only: histogram split selection is
    * driver arithmetic, not SQL. */
  val dt01 = Q.rowsOnly("dt01_decision_tree") { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val (assigned, model) = train(
      li,
      Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
        year(col("l_shipdate"))),
      col("l_returnflag"), depth = 3, bins = 32)
    val leafPred = model.leafClass.toSeq.toDF("node", "pred")
    assigned.groupBy("node", "label").agg(count(lit(1)).as("c"))
      .join(broadcast(leafPred), Seq("node"))
      .groupBy(col("node").as("leaf"), col("pred"))
      .agg(sum("c").as("n"),
        sum(when(col("label") === col("pred"), col("c")).otherwise(0L)).as("n_correct"))
      .orderBy("leaf")
  }

  val all: Seq[Q] = Seq(dt01)
}
