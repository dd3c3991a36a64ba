package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed tree-family training (reference mllib/src/main/scala/org/
  * apache/spark/mllib/tree/DecisionTree.scala:1, RandomForest.scala:1,
  * GradientBoostedTrees.scala:1) re-expressed Spark-first: MLlib's core
  * trick — bin the features once, then train each LEVEL with ONE
  * aggregation pass that collects per (node, feature, bin, label|moment)
  * statistics — maps directly onto a DataFrame groupBy. The driver only
  * ever sees the bounded histogram cube (nodes × features × bins ×
  * stats), never rows; split choice is driver-side arithmetic on those
  * counts (the reference's findBestSplits placement,
  * DecisionTree.scala:1136).
  *
  * Rows carry their current node id as a COLUMN (updated per level by a
  * bounded when-chain on the binned feature), so the tree state lives
  * in the data — no shuffling by node, no per-node passes. The forest
  * reuses the same machinery with per-tree deterministic Poisson(1)
  * bootstrap WEIGHTS (RandomForest.scala's baggedInput — weights, not
  * resampled copies) and per-tree feature subsets; boosting reuses the
  * regression variant on a residual column updated in-plan.
  */
object Trees {

  /** One trained split: route bin ≤ thresholdBin left. */
  final case class Split(node: Int, feature: Int, thresholdBin: Int)

  final case class Model(splits: Map[Int, Split], leafClass: Map[Int, String],
                         depth: Int)

  /** Regression tree: leaves carry the weighted mean response. */
  final case class RModel(splits: Map[Int, Split], leafValue: Map[Int, Double],
                          depth: Int)

  private def gini(counts: Seq[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0 else 1.0 - counts.map(c => (c / n) * (c / n)).sum
  }

  /** Shannon entropy in bits (reference mllib/src/main/scala/org/apache/
    * spark/mllib/tree/impurity/Entropy.scala:1 — −Σ p·log₂p). */
  private def entropy(counts: Seq[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0
    else -counts.filter(_ > 0).map { c =>
      val p = c / n; p * math.log(p)
    }.sum / math.log(2.0)
  }

  /** Resolve an impurity name (the reference's `Impurities.fromString`,
    * mllib/tree/impurity/Impurities.scala:1): classification trees take
    * "gini" (default) or "entropy"; regression uses weighted variance
    * (trainRegressionBinned's SSE), as the reference does. */
  private def impurityFn(name: String): Seq[Long] => Double = name match {
    case "gini"    => gini
    case "entropy" => entropy
    case other => throw new IllegalArgumentException(
      s"impurity '$other' (supported: gini, entropy)")
  }

  /** Fixed-width bin columns from ONE global min/max aggregate —
    * deterministic, unlike sampled quantiles. */
  private def binColumns(raw: DataFrame, d: Int, bins: Int): Seq[Column] = {
    val mmExprs = (0 until d).flatMap(j =>
      Seq(min(col("x")(j)).as(s"lo$j"), max(col("x")(j)).as(s"hi$j")))
    val mm = raw.agg(mmExprs.head, mmExprs.tail: _*).head
    (0 until d).map { j =>
      val lo = mm.getDouble(2 * j); val hi = mm.getDouble(2 * j + 1)
      val w = (hi - lo) / bins
      if (w == 0) lit(0)
      else least(floor((col("x")(j) - lit(lo)) / lit(w)).cast("int"), lit(bins - 1))
    }
  }

  /** Classification-tree prediction as a pure when-chain over the binned
    * feature array column — map-only application. */
  def classifyExpr(model: Model, b: Column): Column = {
    val fallback = model.leafClass.values.toSeq.sorted.headOption.getOrElse("")
    def go(node: Int, depth: Int): Column = model.splits.get(node) match {
      case Some(s) if depth < model.depth =>
        when(b(s.feature) <= s.thresholdBin, go(2 * node + 1, depth + 1))
          .otherwise(go(2 * node + 2, depth + 1))
      case _ => lit(model.leafClass.getOrElse(node, fallback))
    }
    go(0, 0)
  }

  /** Regression-tree prediction, same shape with double leaves. */
  def regressExpr(model: RModel, b: Column): Column = {
    def go(node: Int, depth: Int): Column = model.splits.get(node) match {
      case Some(s) if depth < model.depth =>
        when(b(s.feature) <= s.thresholdBin, go(2 * node + 1, depth + 1))
          .otherwise(go(2 * node + 2, depth + 1))
      case _ => lit(model.leafValue.getOrElse(node, 0.0))
    }
    go(0, 0)
  }

  /** Train a depth-`depth` Gini tree over `fts` (d doubles, binned here)
    * against string label `labelCol`.
    *
    * Per level: one partial-agg groupBy over (node, feature, bin,
    * label) — the posexplode multiplies rows by d (bounded, d tiny) and
    * combines map-side, so the shuffle carries at most
    * nodes·d·bins·classes rows per partition. Ties break (gain desc,
    * feature asc, bin asc) so training is deterministic end-to-end.
    *
    * @param weight   per-row long bootstrap weight (0 = out-of-bag; the
    *                 row still routes and gets a prediction)
    * @param features feature indices this tree may split on (the
    *                 forest's per-tree subset); split stats always
    *                 aggregate all d features — the cube stays bounded —
    *                 but only allowed ones compete
    */
  def train(data: DataFrame, fts: Seq[Column], labelCol: Column,
            depth: Int, bins: Int, weight: Column = lit(1L),
            features: Option[Set[Int]] = None,
            guardGainGaps: Boolean = false,
            impurity: String = "gini",
            gainGapWidth: Double = 2e-12): (DataFrame, Model) = {
    val imp = impurityFn(impurity)
    val d = fts.length
    val allowed = features.getOrElse((0 until d).toSet)
    require(allowed.nonEmpty && allowed.forall(f => f >= 0 && f < d))
    val raw = data.select(array(fts.map(_.cast("double")): _*).as("x"),
      labelCol.cast("string").as("label"), weight.cast("long").as("w"))
    var df = raw.select(array(binColumns(raw, d, bins): _*).as("b"),
      col("label"), col("w"), lit(0).as("node"))
      .localCheckpoint(false) // lazy: level-0's cube collect materializes (r16)

    var splits = Map.empty[Int, Split]
    var leaves = Map.empty[Int, String]
    for (_ <- 0 until depth) {
      val cube = df.select(col("node"), col("label"), col("w"),
        posexplode(col("b")).as(Seq("f", "bin")))
        .groupBy("node", "f", "bin", "label").agg(sum(col("w")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))
      val byNode = cube.groupBy(_._1)
      val levelSplits = byNode.toSeq.sortBy(_._1).flatMap { case (node, rows) =>
        if (splits.contains(node) || leaves.contains(node)) None
        else chooseSplit(rows.toSeq.map(r => (r._2, r._3, r._4, r._5)),
          allowed, bins, guardGainGaps, imp, gainGapWidth) match {
          case Right(s) => Some(s.copy(node = node))
          case Left(leaf) => leaves += node -> leaf; None
        }
      }
      if (levelSplits.nonEmpty) {
        splits ++= levelSplits.map(s => s.node -> s)
        val route = levelSplits.foldLeft(col("node")) { (acc, s) =>
          when(col("node") === s.node,
            lit(s.node * 2 + 1) + (col("b")(s.feature) > s.thresholdBin).cast("int"))
            .otherwise(acc)
        }
        // r16: the routed node column stays a STAGED PROJECTION over the
        // one checkpointed base instead of a per-level re-materialization
        // (each level used to pay one full-frame localCheckpoint job +
        // I/O just to store an integer derivable from `b`). The when-
        // chain is referenced many times by the next level's route, so
        // CollapseProject keeps each level's projection staged — node is
        // computed once per row per job, and every later job scans the
        // same checkpointed partitions in the same order (counts and
        // split choices are bit-identical).
        df = df.select(col("b"), col("label"), col("w"), route.as("node"))
      }
    }
    // finalize leaves: weighted-majority class of every still-open node
    val finalCounts = df.groupBy("node", "label").agg(sum(col("w")).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    finalCounts.groupBy(_._1).foreach { case (node, rows) =>
      if (!splits.contains(node) && !leaves.contains(node))
        leaves += node -> rows.map(r => (r._2, r._3)).toSeq
          .minBy { case (l, c) => (-c, l) }._1
    }
    (df, Model(splits, leafClass = leaves, depth))
  }

  /** Regression tree on a PRE-BINNED frame (columns `b` array<int>,
    * `y` double, `w` long): per level ONE groupBy collecting the
    * (node, feature, bin) → (Σw, Σwy, Σwy²) moment cube; splits by
    * weighted SSE reduction, leaves carry the weighted mean. The
    * boosting loop calls this once per round on the residual column. */
  def trainRegressionBinned(binned: DataFrame, d: Int, depth: Int,
                            bins: Int): RModel = {
    var df = binned
    var splits = Map.empty[Int, Split]
    var leafV = Map.empty[Int, Double]
    def sse(w: Double, sy: Double, syy: Double): Double =
      if (w <= 0) 0.0 else syy - sy * sy / w
    for (_ <- 0 until depth) {
      val cube = df.select(col("node"), col("y"), col("w"),
        posexplode(col("b")).as(Seq("f", "bin")))
        .groupBy("node", "f", "bin")
        .agg(sum(col("w")).as("cw"),
          sum(col("w") * col("y")).as("sy"),
          sum(col("w") * col("y") * col("y")).as("syy"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          r.getLong(3).toDouble, r.getDouble(4), r.getDouble(5)))
      val byNode = cube.groupBy(_._1)
      val levelSplits = byNode.toSeq.sortBy(_._1).flatMap { case (node, rows) =>
        if (splits.contains(node) || leafV.contains(node)) None
        else {
          val f0cells = rows.filter(_._2 == 0)
          val tw = f0cells.map(_._4).sum
          val tsy = f0cells.map(_._5).sum
          val tsyy = f0cells.map(_._6).sum
          val parent = sse(tw, tsy, tsyy)
          if (tw <= 0) { leafV += node -> 0.0; None }
          else {
            var best: Option[(Double, Int, Int)] = None
            for (f <- 0 until d) {
              val cells = rows.filter(_._2 == f)
              var cw = 0.0; var cy = 0.0; var cyy = 0.0
              for (t <- 0 until bins - 1) {
                cells.filter(_._3 == t).foreach { r =>
                  cw += r._4; cy += r._5; cyy += r._6
                }
                if (cw > 0 && cw < tw) {
                  val gain = parent - sse(cw, cy, cyy) -
                    sse(tw - cw, tsy - cy, tsyy - cyy)
                  if (gain > 1e-9 && best.forall(b => gain > b._1 + 1e-9))
                    best = Some((gain, f, t))
                }
              }
            }
            best match {
              case Some((_, f, t)) => Some(Split(node, f, t))
              case None => leafV += node -> tsy / tw; None
            }
          }
        }
      }
      if (levelSplits.nonEmpty) {
        splits ++= levelSplits.map(s => s.node -> s)
        val route = levelSplits.foldLeft(col("node")) { (acc, s) =>
          when(col("node") === s.node,
            lit(s.node * 2 + 1) + (col("b")(s.feature) > s.thresholdBin).cast("int"))
            .otherwise(acc)
        }
        // r16: staged projection, no per-level checkpoint (see train's
        // note — node is a cheap integer function of `b`; rematerializing
        // the whole frame per level bought nothing but a job + I/O)
        df = df.select(col("b"), col("y"), col("w"), route.as("node"))
      }
    }
    val fin = df.groupBy("node")
      .agg(sum(col("w")).as("cw"), sum(col("w") * col("y")).as("sy"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toDouble, r.getDouble(2)))
    fin.foreach { case (node, w, sy) =>
      if (!splits.contains(node) && !leafV.contains(node) && w > 0)
        leafV += node -> sy / w
    }
    RModel(splits, leafV, depth)
  }

  /** Bin a raw (features, y) frame once for the regression/boosting
    * loops. Returns the checkpointed frame (b, y, w, node=0). */
  def binForRegression(data: DataFrame, fts: Seq[Column], yCol: Column,
                       bins: Int): DataFrame = {
    val d = fts.length
    val raw = data.select(array(fts.map(_.cast("double")): _*).as("x"),
      yCol.cast("double").as("y"))
    raw.select(array(binColumns(raw, d, bins): _*).as("b"), col("y"),
      lit(1L).as("w"), lit(0).as("node"))
      .localCheckpoint(false) // lazy: the caller's first pass materializes (r16)
  }

  /** Split choice for one node from its histogram cells
    * ((f, bin, label, weight) tuples): the driver-side arithmetic shared
    * by the single tree and the forest. Returns Right(split) or
    * Left(majority leaf class). */
  /** `guardGaps` asserts the dt01-oracle assumption at every node: the
    * DuckDB CTE replay (`g >= mg - 1e-12` + (f,t) argmin) equals this
    * sequential epsilon update (`g > best + 1e-12`) only while no two
    * DISTINCT gain values sit within (0, 2e-12] of each other (exact
    * ties are safe — both tie-breaks pick the smallest (f,t)). The
    * guard makes corpus drift fail HERE, loudly, instead of as an
    * opaque verify hash mismatch (TreesSpec runs it on the real
    * table with dt01's exact configuration). */
  private def chooseSplit(rows: Seq[(Int, Int, String, Long)],
                          allowed: Set[Int], bins: Int,
                          guardGaps: Boolean = false,
                          imp: Seq[Long] => Double = gini,
                          gapWidth: Double = 2e-12): Either[String, Split] = {
    val f0 = allowed.min
    val labels = rows.groupBy(_._3).map { case (l, rs) =>
      // feature f0 cells carry each row's weight exactly once
      l -> rs.filter(_._1 == f0).map(_._4).sum
    }
    val total = labels.values.sum
    val parentG = imp(labels.values.toSeq)
    val majority = labels.toSeq.minBy { case (l, c) => (-c, l) }._1
    if (labels.count(_._2 > 0) <= 1) Left(majority)
    else {
      // materialize every candidate (bounded: d·bins entries) so the
      // guard can inspect the full gain multiset
      val candidates = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int)]
      for (f <- allowed.toSeq.sorted) {
        val cells = rows.filter(_._1 == f)
        val labelsSeq = labels.keys.toSeq.sorted
        val prefix = scala.collection.mutable.Map(labelsSeq.map(_ -> 0L): _*)
        for (t <- 0 until bins - 1) {
          cells.filter(_._2 == t).foreach(r => prefix(r._3) += r._4)
          val left = labelsSeq.map(prefix)
          val nL = left.sum
          if (nL > 0 && nL < total) {
            val right = labelsSeq.zip(left).map { case (l, c) => labels(l) - c }
            val g = parentG -
              (nL.toDouble / total) * imp(left) -
              ((total - nL).toDouble / total) * imp(right)
            candidates += ((g, f, t))
          }
        }
      }
      if (guardGaps) {
        // sufficient condition for the replay to be exact: every pair of
        // DISTINCT gain values sits > 2·ε apart (ε = 1e-12), so a ±ε band
        // around the max holds exactly one distinct value and both
        // argmax formulations collapse to the same (f, t); exact ties
        // are safe (both tie-breaks pick the smallest (f, t))
        val distinctGains = candidates.map(_._1).distinct.sorted
        if (gapWidth <= 1e-10) {
          // exact-value replays (gini: rational arithmetic, bit-identical
          // across engines): the all-pairs sufficient condition
          distinctGains.zip(distinctGains.drop(1)).foreach { case (a, b) =>
            assert(b - a > gapWidth,
              f"two distinct split gains within $gapWidth%g ($a%.15g vs $b%.15g): " +
                "the oracle's epsilon argmax is no longer exact on this corpus")
          }
        } else if (distinctGains.nonEmpty) {
          // widened-band replays (entropy: cross-engine log noise up to
          // ~1e-13) need only the conditions the argmax actually uses:
          // (1) the runner-up distinct gain sits > gapWidth below the
          // max, so the replay's band around ITS max holds exactly the
          // exact-tie group; (2) positivity thresholds agree — a
          // splitting max must clear the replay's g > band filter too
          // (a non-splitting node has all gains <= 1e-12, which stays
          // below the band on any engine). Gaps far below the max are
          // irrelevant — only the top of the ladder decides the split.
          val mg = distinctGains.last
          if (mg > 1e-12) {
            assert(mg > gapWidth,
              f"max split gain $mg%.15g inside the ambiguous positivity " +
                f"window (1e-12, $gapWidth%g]: split/leaf decision is not " +
                "engine-portable on this corpus")
            distinctGains.dropRight(1).lastOption.foreach { runnerUp =>
              assert(mg - runnerUp > gapWidth,
                f"runner-up split gain within $gapWidth%g of the max " +
                  f"($runnerUp%.15g vs $mg%.15g): the widened-band argmax " +
                  "is no longer exact on this corpus")
            }
          }
        }
      }
      var best: Option[(Double, Int, Int)] = None
      candidates.foreach { case (g, f, t) =>
        if (g > 1e-12 && best.forall(b => g > b._1 + 1e-12))
          best = Some((g, f, t))
      }
      best.map { case (_, f, t) => Split(-1, f, t) }.toRight(majority)
    }
  }

  /** The forest's deterministic per-tree feature subset. */
  private def featureSubset(t: Int, d: Int, k: Int): Set[Int] = {
    val s = (0 until k).map(i => (t * 31 + i * 17 + i) % d).distinct
    if (s.size < k)
      ((0 until d).filterNot(s.contains).take(k - s.size) ++ s).toSet
    else s.toSet
  }

  /** Random forest (RandomForest.scala:1 parity): `nTrees` Gini trees,
    * each seeing deterministic per-row Poisson(1) bootstrap WEIGHTS
    * (xxhash64 of the id columns + tree index, the reference's
    * baggedInput-by-weights — no data copies) and a per-tree feature
    * subset (featureSubsetStrategy).
    *
    * All trees train TOGETHER, one aggregation pass per LEVEL for the
    * whole forest (the reference's node-group batching,
    * RandomForest.scala's findBestSplits over a node queue): rows carry
    * a per-tree node-id ARRAY and a per-tree weight ARRAY; the level
    * pass explodes the tree index (×nTrees) and the features (×d) —
    * both bounded — and partial-aggregates the
    * (tree, node, feature, bin, label) cube, so the whole forest costs
    * `depth` cluster passes, not nTrees·depth. Prediction is the
    * per-row plurality vote folded as a pure column expression —
    * map-only application, models live in the plan.
    *
    * @return (per-tree models, the final binned frame (b, label, w,
    *         node) — already checkpointed, so a consumer scoring the
    *         training set votes over it directly instead of re-scanning
    *         and re-binning the source (one min/max pass + one full
    *         scan saved; bins are identical by construction)) */
  def forest(data: DataFrame, fts: Seq[Column], labelCol: Column,
             idCols: Seq[Column], depth: Int, bins: Int, nTrees: Int,
             featuresPerTree: Int,
             guardGainGaps: Boolean = false,
             impurity: String = "gini",
             gainGapWidth: Double = 2e-12): (Seq[Model], DataFrame) = {
    val imp = impurityFn(impurity)
    val d = fts.length
    val allowed = (0 until nTrees).map(t => featureSubset(t, d, featuresPerTree))
    // deterministic Poisson(1) weights: P(0)=.368 P(1)=.368 P(2)=.184 ...
    val wCols = (0 until nTrees).map { t =>
      val h = pmod(xxhash64((idCols :+ (lit(t): Column)): _*), lit(1000L))
      when(h < 368, 0L).when(h < 736, 1L).when(h < 920, 2L)
        .when(h < 981, 3L).otherwise(4L)
    }
    val raw = data.select(array(fts.map(_.cast("double")): _*).as("x"),
      labelCol.cast("string").as("label"), array(wCols: _*).as("w"))
    var df = raw.select(array(binColumns(raw, d, bins): _*).as("b"),
      col("label"), col("w"),
      typedlit(Seq.fill(nTrees)(0)).as("node"))
      .localCheckpoint(false) // lazy: level-0's cube collect materializes (r16)

    val splits = Array.fill(nTrees)(Map.empty[Int, Split])
    val leaves = Array.fill(nTrees)(Map.empty[Int, String])
    // only a tree's ALLOWED features ever compete in chooseSplit (whose
    // weight-carrier is allowed.min, also in the set), so the level cube
    // drops the others before the shuffle: nTrees×featuresPerTree rows
    // per input row instead of nTrees×d
    // (r17 note: exploding the allowed (t, f) pairs DIRECTLY as a
    // struct-array literal — skipping the nTrees×d intermediate and this
    // filter — was measured ~15% SLOWER across every sample (5.4 → 6.2 s
    // warm) and reverted: a struct-array literal explode materializes
    // row objects where posexplode over the int array + an int-compare
    // filter stays in flat codegen. Same trap as r16's reverted t05
    // literal-model shape.)
    val allowedPair = (0 until nTrees).map(t =>
      col("t") === t && col("f").isin(allowed(t).toSeq.sorted.map(Int.box): _*))
      .reduce(_ || _)
    for (_ <- 0 until depth) {
      val cube = df
        .select(col("b"), col("label"), col("w"), col("node"),
          explode(sequence(lit(0), lit(nTrees - 1))).as("t"))
        .select(col("t"), element_at(col("node"), col("t") + 1).as("node"),
          element_at(col("w"), col("t") + 1).as("wt"), col("label"),
          posexplode(col("b")).as(Seq("f", "bin")))
        .filter(allowedPair)
        .groupBy("t", "node", "f", "bin", "label").agg(sum("wt").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4), r.getLong(5)))
      val routes = (0 until nTrees).map { t =>
        val mine = cube.filter(_._1 == t)
        val levelSplits = mine.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
          case (node, rows) =>
            if (splits(t).contains(node) || leaves(t).contains(node)) None
            else chooseSplit(rows.toSeq.map(r => (r._3, r._4, r._5, r._6)),
              allowed(t), bins, guardGainGaps, imp, gainGapWidth) match {
              case Right(s) => Some(s.copy(node = node))
              case Left(leaf) => leaves(t) += node -> leaf; None
            }
        }
        splits(t) ++= levelSplits.map(s => s.node -> s)
        val nodeT = element_at(col("node"), t + 1)
        levelSplits.foldLeft(nodeT) { (acc, s) =>
          when(nodeT === s.node,
            lit(s.node * 2 + 1) + (col("b")(s.feature) > s.thresholdBin).cast("int"))
            .otherwise(acc)
        }
      }
      // (r16 note: dropping this per-level checkpoint for a staged
      // projection — the trainRegressionBinned/train change — was
      // measured and REVERTED here: the forest's per-level route is an
      // nTrees-wide ARRAY feeding an nTrees-way explode, so recomputing
      // all previous levels' arrays per scan cost more than the saved
      // materialization, 6.1 s → 9.2 s at sf0.1.)
      // r16: LAZY checkpoint — the next level's cube collect (or the
      // leaf-finalize pass) materializes the routed frame in the same
      // job, fusing the former per-level eager write job with its first
      // consumer; blocks persist exactly as before.
      df = df.select(col("b"), col("label"), col("w"),
        array(routes: _*).as("node")).localCheckpoint(false)
    }
    // finalize leaves for every still-open (tree, node) in ONE pass
    val fin = df
      .select(col("label"), col("w"), col("node"),
        explode(sequence(lit(0), lit(nTrees - 1))).as("t"))
      .groupBy(col("t"), element_at(col("node"), col("t") + 1).as("node"),
        col("label"))
      .agg(sum(element_at(col("w"), col("t") + 1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    fin.groupBy(r => (r._1, r._2)).foreach { case ((t, node), rows) =>
      if (!splits(t).contains(node) && !leaves(t).contains(node))
        leaves(t) += node -> rows.map(r => (r._3, r._4)).toSeq
          .minBy { case (l, c) => (-c, l) }._1
    }
    ((0 until nTrees).map(t => Model(splits(t), leaves(t), depth)), df)
  }

  /** Plurality vote over a per-tree prediction ARRAY column, ties to
    * the lexicographically smallest class (deterministic). Pass a
    * STAGED attribute (r15 — the t10 lesson): `preds` is referenced by
    * array_distinct plus once per distinct class inside the fold, so a
    * composed classifier array would re-evaluate every tree's
    * when-chain per reference. */
  def voteFromPreds(preds: Column): Column = {
    // count occurrences of each distinct prediction, pick (max count, min class)
    val best = aggregate(
      array_distinct(preds),
      struct(lit(-1).as("c"), lit("").as("cls")),
      (acc, cls) => {
        val c = size(filter(preds, p => p === cls))
        when(c > acc.getField("c") ||
          (c === acc.getField("c") && cls < acc.getField("cls")),
          struct(c.as("c"), cls.as("cls"))).otherwise(acc)
      })
    best.getField("cls")
  }

  /** Compose-form of [[voteFromPreds]] over the models' classifier
    * expressions — convenient for small frames/tests; hot paths should
    * stage the prediction array first (rf01 does). */
  def voteExpr(models: Seq[Model], b: Column): Column =
    voteFromPreds(array(models.map(m => classifyExpr(m, b)): _*))

  /** The whole depth-3 Gini induction of [[dt01]] replayed in SQL: the
    * same fixed-width bins from one global min/max, then per level the
    * (node, feature, bin, label) count cube, threshold prefix sums,
    * Gini gains in the fixed A/N/R operation order, the 1e-12-epsilon
    * argmax with (feature, threshold) tie-break, and the when-chain
    * routing — three unrolled levels, then weighted-majority leaves.
    * Gains are arithmetic on integer counts, so distinct split
    * configurations sit ≫1e-12 apart and the epsilon rule picks the
    * identical split on both engines. */
  /** The dt01/dt02 induction replay, parameterized on the impurity.
    *
    * Gini gains are rational arithmetic on integer counts — bit-identical
    * across engines — so the replay's argmax band is the trainer's own
    * 1e-12 epsilon. Entropy gains contain p·log₂p, and log is NOT
    * correctly-rounded-portable across libms (DuckDB's log2 vs the JVM's
    * Math.log/ln2 differ in final ULPs, ~1e-15 absolute on these gains),
    * so the dt02 replay widens the band to 1e-9 and the trainer asserts
    * distinct gains sit > 2e-9 apart (`gainGapWidth`): within the band
    * both engines see exactly the max-tied group (identical count
    * configurations are exact ties on BOTH engines — same rational
    * inputs, same expression), and the shared (f, t) argmin picks the
    * same split. The epsilon-exactness argument is dt01's, with the
    * cross-engine log noise absorbed by the widened, guarded gap. */
  private def dtOracleSql(impurity: String): String = {
    val eps = if (impurity == "entropy") "1e-9" else "1e-12"
    // impurity of (a, b, c) label counts over denominator expression den
    def imp(a: String, b: String, c: String, den: String): String =
      impurity match {
        case "entropy" =>
          def term(x: String) =
            s"(CASE WHEN $x > 0 THEN -($x/($den))*log2($x/($den)) ELSE 0 END)"
          s"(${term(a)} + ${term(b)} + ${term(c)})"
        case _ =>
          s"(1.0 - (pow($a/($den),2) + pow($b/($den),2) + pow($c/($den),2)))"
      }
    val parent = imp("tA", "tN", "tR", "tA+tN+tR")
    val left = imp("lA", "lN", "lR", "lA+lN+lR")
    val right = imp("(tA-lA)", "(tN-lN)", "(tR-lR)", "tA+tN+tR-lA-lN-lR")
    val prefix =
      """WITH raw AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x0, CAST(l_discount AS DOUBLE) AS x1,
        |         CAST(l_tax AS DOUBLE) AS x2, CAST(year(l_shipdate) AS DOUBLE) AS x3,
        |         l_returnflag AS label
        |  FROM lineitem),
        |mm AS (
        |  SELECT min(x0) AS lo0, max(x0) AS hi0, min(x1) AS lo1, max(x1) AS hi1,
        |         min(x2) AS lo2, max(x2) AS hi2, min(x3) AS lo3, max(x3) AS hi3
        |  FROM raw),
        |routed0 AS (
        |  SELECT
        |    CASE WHEN hi0=lo0 THEN 0 ELSE least(CAST(floor((x0-lo0)/((hi0-lo0)/32)) AS INT), 31) END AS b0,
        |    CASE WHEN hi1=lo1 THEN 0 ELSE least(CAST(floor((x1-lo1)/((hi1-lo1)/32)) AS INT), 31) END AS b1,
        |    CASE WHEN hi2=lo2 THEN 0 ELSE least(CAST(floor((x2-lo2)/((hi2-lo2)/32)) AS INT), 31) END AS b2,
        |    CASE WHEN hi3=lo3 THEN 0 ELSE least(CAST(floor((x3-lo3)/((hi3-lo3)/32)) AS INT), 31) END AS b3,
        |    label, 0 AS node
        |  FROM raw, mm)""".stripMargin
    val levels = (1 to 3).map { i =>
      val src = s"routed${i - 1}"
      s""",
        |cells$i AS (
        |  SELECT node, f, bin, label, count(*) AS c FROM (
        |    SELECT node, 0 AS f, b0 AS bin, label FROM $src
        |    UNION ALL SELECT node, 1, b1, label FROM $src
        |    UNION ALL SELECT node, 2, b2, label FROM $src
        |    UNION ALL SELECT node, 3, b3, label FROM $src)
        |  GROUP BY node, f, bin, label),
        |tot$i AS (
        |  SELECT node,
        |    sum(CASE WHEN label='A' THEN c ELSE 0 END) AS tA,
        |    sum(CASE WHEN label='N' THEN c ELSE 0 END) AS tN,
        |    sum(CASE WHEN label='R' THEN c ELSE 0 END) AS tR
        |  FROM cells$i WHERE f = 0 GROUP BY node),
        |lefts$i AS (
        |  SELECT c.node, c.f, t.t AS t,
        |    sum(CASE WHEN c.label='A' THEN c.c ELSE 0 END) AS lA,
        |    sum(CASE WHEN c.label='N' THEN c.c ELSE 0 END) AS lN,
        |    sum(CASE WHEN c.label='R' THEN c.c ELSE 0 END) AS lR
        |  FROM cells$i c JOIN range(0, 31) t(t) ON c.bin <= t.t
        |  GROUP BY c.node, c.f, t.t),
        |gains$i AS (
        |  SELECT l.node, l.f, l.t,
        |    $parent
        |    - ((lA+lN+lR)*1.0/(tA+tN+tR)) * $left
        |    - ((tA+tN+tR-lA-lN-lR)*1.0/(tA+tN+tR)) * $right AS g
        |  FROM lefts$i l JOIN tot$i USING (node)
        |  WHERE (lA+lN+lR) > 0 AND (lA+lN+lR) < (tA+tN+tR)),
        |best$i AS (
        |  SELECT node, f, t FROM (
        |    SELECT node, f, t, g, max(g) OVER (PARTITION BY node) AS mg
        |    FROM gains$i WHERE g > $eps) q
        |  WHERE g >= mg - $eps
        |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY f, t) = 1),
        |routed$i AS (
        |  SELECT r.b0, r.b1, r.b2, r.b3, r.label,
        |    CASE WHEN b.node IS NULL THEN r.node
        |         ELSE r.node*2 + 1 + CASE WHEN (CASE b.f WHEN 0 THEN r.b0 WHEN 1 THEN r.b1
        |                                        WHEN 2 THEN r.b2 ELSE r.b3 END) > b.t
        |                             THEN 1 ELSE 0 END
        |    END AS node
        |  FROM $src r LEFT JOIN best$i b ON r.node = b.node)""".stripMargin
    }.mkString
    prefix + levels +
      """,
        |leafc AS (
        |  SELECT node AS leaf, label, count(*) AS c FROM routed3 GROUP BY node, label),
        |pred AS (
        |  SELECT leaf, label AS pred FROM (
        |    SELECT leaf, label, c,
        |      row_number() OVER (PARTITION BY leaf ORDER BY c DESC, label) AS rn
        |    FROM leafc) q WHERE rn = 1)
        |SELECT l.leaf, p.pred, CAST(sum(l.c) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN l.label = p.pred THEN l.c ELSE 0 END) AS BIGINT) AS n_correct
        |FROM leafc l JOIN pred p USING (leaf)
        |GROUP BY l.leaf, p.pred
        |ORDER BY l.leaf""".stripMargin
  }

  /** Registered pass: depth-3 Gini tree predicting `l_returnflag` from
    * (quantity, discount, tax, ship year). Output is the bounded
    * per-leaf summary (leaf, rows, predicted class, correct rows);
    * TreesSpec pins exact planted-split recovery, determinism, and the
    * training-accuracy ≥ majority-class invariant (which holds by
    * construction for majority-vote leaves; the synthetic returnflag is
    * uniform noise, so accuracy sits AT the majority floor).
    * FULL value oracle: [[dtOracleSql]] (gini) replays the whole induction —
    * binning, level-order Gini split selection, routing, majority
    * leaves — in DuckDB. */
  val dt01 = Q.sql("dt01_decision_tree", dtOracleSql("gini")) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val (assigned, model) = train(
      li,
      Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
        year(col("l_shipdate"))),
      col("l_returnflag"), depth = 3, bins = 32,
      // free driver-side assert over the already-collected candidate
      // gains (r11 advice): the SQL replay's exactness rests on gains
      // sitting >2e-12 apart — guard it in the REGISTERED run at the
      // driver's SF, not only in TreesSpec's corpora
      guardGainGaps = true)
    val leafPred = model.leafClass.toSeq.toDF("node", "pred")
    assigned.groupBy("node", "label").agg(count(lit(1)).as("c"))
      .join(broadcast(leafPred), Seq("node"))
      .groupBy(col("node").as("leaf"), col("pred"))
      .agg(sum("c").as("n"),
        sum(when(col("label") === col("pred"), col("c")).otherwise(0L)).as("n_correct"))
      .orderBy("leaf")
  }

  /** The whole 5-tree forest induction of [[rf01]] replayed in SQL
    * (r10): dt01's level replay, parameterized per tree, PLUS the
    * deterministic Poisson(1) bootstrap weights re-derived by a chained
    * XXH64 replay — hashLong(l_orderkey, 42) → hashInt(l_linenumber) →
    * hashLong(l_partkey) → hashInt(t), exactly Spark's multi-argument
    * `xxhash64` fold ([[graft.functions.DuckXxhash]] arithmetic:
    * HUGEINT modular multiplies, exact rotations) — then pmod-1000
    * Poisson buckets, per-tree feature subsets, weighted Gini cubes
    * (one shared cells chain per level with a tree column), weighted-
    * majority leaves, and the plurality vote (ties to the smallest
    * class) folded over the bounded (label, p0..p4) combinations.
    *
    * Chained CTEs are `MATERIALIZED`: DuckDB inlines single-reference
    * CTEs, and a ~40-deep modular-arithmetic chain inlines into an
    * exponentially large expression tree (measured: minutes/17 GB
    * unmaterialized → 16 s at sf0.01 materialized).
    *
    * Exactness rests on the same two measured assumptions as dt01,
    * both guarded: gain gaps ≫ 2e-12 (TreesSpec runs the forest with
    * `guardGainGaps` on the real table) and integer weighted counts. */
  private def rf01OracleSql: String = {
    import graft.functions.DuckXxhash.{M64, P1, P2, P3, P4, P5, u, mul64c, rot, xor}
    val keep = "b0, b1, b2, b3, label"
    val nTrees = 5
    val allowed = (0 until nTrees).map(t => featureSubset(t, 4, 2))
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    // fused three-step fmix over columns x0..x{n-1} -> h0..h{n-1}
    def fmix(n: Int, src: String, keepCols: String, tag: String): String = {
      val c1 = (0 until n).map(j =>
        s"${mul64c(xor(s"x$j", s"x$j//${graft.functions.DuckXxhash.pow2(33)}"), P2)} AS y$j")
        .mkString(", ")
      ctes += s"${tag}1 AS MATERIALIZED (SELECT $keepCols, $c1 FROM $src)"
      val c2 = (0 until n).map(j =>
        s"${mul64c(xor(s"y$j", s"y$j//${graft.functions.DuckXxhash.pow2(29)}"), P3)} AS z$j")
        .mkString(", ")
      ctes += s"${tag}2 AS MATERIALIZED (SELECT $keepCols, $c2 FROM ${tag}1)"
      val c3 = (0 until n).map(j =>
        s"${xor(s"z$j", s"z$j//${graft.functions.DuckXxhash.pow2(32)}")} AS h$j")
        .mkString(", ")
      ctes += s"${tag}3 AS MATERIALIZED (SELECT $keepCols, $c3 FROM ${tag}2)"
      s"${tag}3"
    }
    val head =
      s"""WITH raw AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         CAST(l_quantity AS DOUBLE) AS x0, CAST(l_discount AS DOUBLE) AS x1,
        |         CAST(l_tax AS DOUBLE) AS x2, CAST(year(l_shipdate) AS DOUBLE) AS x3,
        |         l_returnflag AS label
        |  FROM lineitem),
        |mm AS (
        |  SELECT min(x0) AS lo0, max(x0) AS hi0, min(x1) AS lo1, max(x1) AS hi1,
        |         min(x2) AS lo2, max(x2) AS hi2, min(x3) AS lo3, max(x3) AS hi3
        |  FROM raw),
        |binned AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN hi0=lo0 THEN 0 ELSE least(CAST(floor((x0-lo0)/((hi0-lo0)/32)) AS INT), 31) END AS b0,
        |    CASE WHEN hi1=lo1 THEN 0 ELSE least(CAST(floor((x1-lo1)/((hi1-lo1)/32)) AS INT), 31) END AS b1,
        |    CASE WHEN hi2=lo2 THEN 0 ELSE least(CAST(floor((x2-lo2)/((hi2-lo2)/32)) AS INT), 31) END AS b2,
        |    CASE WHEN hi3=lo3 THEN 0 ELSE least(CAST(floor((x3-lo3)/((hi3-lo3)/32)) AS INT), 31) END AS b3,
        |    label,
        |    (CASE WHEN l_orderkey < 0 THEN l_orderkey::HUGEINT + $M64 ELSE l_orderkey::HUGEINT END) AS uok,
        |    (CASE WHEN l_linenumber < 0 THEN l_linenumber::HUGEINT + 4294967296 ELSE l_linenumber::HUGEINT END) AS uln,
        |    (CASE WHEN l_partkey < 0 THEN l_partkey::HUGEINT + $M64 ELSE l_partkey::HUGEINT END) AS upk
        |  FROM raw, mm)""".stripMargin
    // hashLong(uok, seed 42)
    ctes += s"""ha AS MATERIALIZED (SELECT $keep, uln, upk,
      |  ${xor(u(42L + P5 + 8L), mul64c(rot(mul64c("uok", P2), 31), P1))} AS s FROM binned)""".stripMargin
    ctes += s"""hb AS MATERIALIZED (SELECT $keep, uln, upk,
      |  (${mul64c(rot("s", 27), P1)} + ${u(P4)}) % $M64 AS x0 FROM ha)""".stripMargin
    var src = fmix(1, "hb", s"$keep, uln, upk", "hc")
    // hashInt(uln, h0)
    ctes += s"""hd AS MATERIALIZED (SELECT $keep, upk,
      |  ${xor(s"(h0 + ${u(P5 + 4L)}) % $M64", s"(uln * ${u(P1)}) % $M64")} AS s FROM $src)""".stripMargin
    ctes += s"""he AS MATERIALIZED (SELECT $keep, upk,
      |  (${mul64c(rot("s", 23), P2)} + ${u(P3)}) % $M64 AS x0 FROM hd)""".stripMargin
    src = fmix(1, "he", s"$keep, upk", "hf")
    // hashLong(upk, h0)
    ctes += s"""hg AS MATERIALIZED (SELECT $keep, h0 AS hseed,
      |  ${mul64c(rot(mul64c("upk", P2), 31), P1)} AS r FROM $src)""".stripMargin
    ctes += s"""hh AS MATERIALIZED (SELECT $keep,
      |  (${mul64c(rot(xor(s"(hseed + ${u(P5 + 8L)}) % $M64", "r"), 27), P1)} + ${u(P4)}) % $M64 AS x0
      |  FROM hg)""".stripMargin
    src = fmix(1, "hh", keep, "hi")
    // per-tree hashInt(t, H), fused across the nTrees columns
    val perTree = (0 until nTrees).map(t =>
      s"(${mul64c(rot(xor(s"(h0 + ${u(P5 + 4L)}) % $M64", s"(${t.toLong} * ${u(P1)}) % $M64"), 23), P2)} + ${u(P3)}) % $M64 AS x$t")
      .mkString(", ")
    ctes += s"hj AS MATERIALIZED (SELECT $keep, $perTree FROM $src)"
    src = fmix(nTrees, "hj", keep, "hk")
    // pmod-1000 Poisson buckets
    def pm(t: Int) =
      s"((((CASE WHEN h$t >= ${graft.functions.DuckXxhash.pow2(63)} THEN (h$t - $M64)::BIGINT ELSE h$t::BIGINT END) % 1000) + 1000) % 1000)"
    val wc = (0 until nTrees).map(t =>
      s"(CASE WHEN ${pm(t)} < 368 THEN 0::BIGINT WHEN ${pm(t)} < 736 THEN 1 " +
        s"WHEN ${pm(t)} < 920 THEN 2 WHEN ${pm(t)} < 981 THEN 3 ELSE 4 END) AS w$t")
      .mkString(", ")
    ctes += s"routed0 AS MATERIALIZED (SELECT $keep, $wc, " +
      (0 until nTrees).map(t => s"0 AS n$t").mkString(", ") + s" FROM $src)"

    val nodeCase = "CASE tr.t " +
      (0 until nTrees).map(t => s"WHEN $t THEN n$t").mkString(" ") + " END"
    val wCase = "CASE tr.t " +
      (0 until nTrees).map(t => s"WHEN $t THEN w$t").mkString(" ") + " END"
    val treeVals = (0 until nTrees).map(t => s"($t)").mkString(",")
    val allowPred = (0 until nTrees).map(t =>
      s"(l.tree = $t AND l.f IN (${allowed(t).toSeq.sorted.mkString(", ")}))")
      .mkString(" OR ")
    for (i <- 1 to 3) {
      val prev = s"routed${i - 1}"
      ctes += s"""cells$i AS MATERIALIZED (
        |  SELECT tr.t AS tree, $nodeCase AS node, fv.f AS f,
        |         CASE fv.f WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bin,
        |         label, sum($wCase) AS c
        |  FROM $prev, (VALUES $treeVals) tr(t), (VALUES (0),(1),(2),(3)) fv(f)
        |  GROUP BY tree, node, f, bin, label)""".stripMargin
      ctes += s"""tot$i AS (
        |  SELECT tree, node,
        |    sum(CASE WHEN label='A' THEN c ELSE 0 END) AS tA,
        |    sum(CASE WHEN label='N' THEN c ELSE 0 END) AS tN,
        |    sum(CASE WHEN label='R' THEN c ELSE 0 END) AS tR
        |  FROM cells$i WHERE f = 0 GROUP BY tree, node)""".stripMargin
      ctes += s"""lefts$i AS (
        |  SELECT c.tree, c.node, c.f, t.t AS t,
        |    sum(CASE WHEN c.label='A' THEN c.c ELSE 0 END) AS lA,
        |    sum(CASE WHEN c.label='N' THEN c.c ELSE 0 END) AS lN,
        |    sum(CASE WHEN c.label='R' THEN c.c ELSE 0 END) AS lR
        |  FROM cells$i c JOIN range(0, 31) t(t) ON c.bin <= t.t
        |  GROUP BY c.tree, c.node, c.f, t.t)""".stripMargin
      ctes += s"""gains$i AS (
        |  SELECT l.tree, l.node, l.f, l.t,
        |    (1.0 - (pow(tA/(tA+tN+tR),2) + pow(tN/(tA+tN+tR),2) + pow(tR/(tA+tN+tR),2)))
        |    - ((lA+lN+lR)*1.0/(tA+tN+tR)) *
        |      (1.0 - (pow(lA/(lA+lN+lR),2) + pow(lN/(lA+lN+lR),2) + pow(lR/(lA+lN+lR),2)))
        |    - ((tA+tN+tR-lA-lN-lR)*1.0/(tA+tN+tR)) *
        |      (1.0 - (pow((tA-lA)/(tA+tN+tR-lA-lN-lR),2)
        |            + pow((tN-lN)/(tA+tN+tR-lA-lN-lR),2)
        |            + pow((tR-lR)/(tA+tN+tR-lA-lN-lR),2))) AS g
        |  FROM lefts$i l JOIN tot$i USING (tree, node)
        |  WHERE (lA+lN+lR) > 0 AND (lA+lN+lR) < (tA+tN+tR) AND ($allowPred))""".stripMargin
      ctes += s"""best$i AS MATERIALIZED (
        |  SELECT tree, node, f, t FROM (
        |    SELECT tree, node, f, t, g, max(g) OVER (PARTITION BY tree, node) AS mg
        |    FROM gains$i WHERE g > 1e-12) q
        |  WHERE g >= mg - 1e-12
        |  QUALIFY row_number() OVER (PARTITION BY tree, node ORDER BY f, t) = 1)""".stripMargin
      val routes = (0 until nTrees).map(t =>
        s"""CASE WHEN bt$t.node IS NULL THEN r.n$t
          |         ELSE r.n$t*2 + 1 + CASE WHEN (CASE bt$t.f WHEN 0 THEN r.b0 WHEN 1 THEN r.b1
          |                                        WHEN 2 THEN r.b2 ELSE r.b3 END) > bt$t.t
          |                             THEN 1 ELSE 0 END END AS n$t""".stripMargin)
        .mkString(",\n    ")
      val joins = (0 until nTrees).map(t =>
        s"LEFT JOIN best$i bt$t ON bt$t.tree = $t AND r.n$t = bt$t.node")
        .mkString("\n  ")
      ctes += s"""routed$i AS MATERIALIZED (
        |  SELECT r.b0, r.b1, r.b2, r.b3, r.label, ${(0 until nTrees).map(t => s"r.w$t").mkString(", ")},
        |    $routes
        |  FROM $prev r
        |  $joins)""".stripMargin
    }
    val leafSel = (0 until nTrees).map(t =>
      s"SELECT $t AS tree, n$t AS leaf, label, w$t AS w FROM routed3")
      .mkString(" UNION ALL ")
    ctes += s"""leafc AS MATERIALIZED (
      |  SELECT tree, leaf, label, sum(w) AS c FROM ($leafSel) GROUP BY tree, leaf, label)""".stripMargin
    ctes += """preds AS MATERIALIZED (
      |  SELECT tree, leaf, label AS p FROM (
      |    SELECT tree, leaf, label, c,
      |      row_number() OVER (PARTITION BY tree, leaf ORDER BY c DESC, label) AS rn
      |    FROM leafc) q WHERE rn = 1)""".stripMargin
    val predJoins = (0 until nTrees).map(t =>
      s"JOIN preds p$t ON p$t.tree = $t AND r.n$t = p$t.leaf").mkString("\n  ")
    ctes += s"""combos AS (
      |  SELECT r.label AS actual, ${(0 until nTrees).map(t => s"p$t.p AS c$t").mkString(", ")},
      |         count(*) AS cnt
      |  FROM routed3 r
      |  $predJoins
      |  GROUP BY ALL)""".stripMargin
    def cnt(lab: String) = (0 until nTrees)
      .map(t => s"(CASE WHEN c$t = '$lab' THEN 1 ELSE 0 END)").mkString(" + ")
    ctes += s"""voted AS (
      |  SELECT actual, cnt,
      |    (CASE WHEN (${cnt("A")}) >= (${cnt("N")})
      |           AND (${cnt("A")}) >= (${cnt("R")}) THEN 'A'
      |          WHEN (${cnt("N")}) >= (${cnt("R")}) THEN 'N'
      |          ELSE 'R' END) AS pred
      |  FROM combos)""".stripMargin
    head + ",\n" + ctes.mkString(",\n") + "\n" +
      """SELECT actual, pred, CAST(sum(cnt) AS BIGINT) AS n
        |FROM voted GROUP BY actual, pred ORDER BY actual, pred""".stripMargin
  }

  /** Registered pass: 5-tree random forest on dt01's task — the
    * bounded confusion matrix (actual, pred, n). FULL value oracle via
    * [[rf01OracleSql]] (the induction replayed in SQL); TreesSpec pins
    * planted recovery through bagging noise, determinism, the majority
    * floor, and the forest gain-gap exactness guard. */
  val rf01 = Q.sql("rf01_random_forest", rf01OracleSql) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val (models, frame) = forest(li, fts, col("l_returnflag"),
      idCols = Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
      depth = 3, bins = 32, nTrees = 5, featuresPerTree = 2,
      // same near-tie guard as dt01's registered run (r11): a corpus
      // drift shows as this targeted assert, not an opaque hash mismatch
      guardGainGaps = true)
    // vote over the trainer's own binned frame (r10): no second min/max
    // pass, no re-scan of lineitem; the per-tree prediction array is
    // STAGED so each tree's when-chain evaluates once per row (r15)
    frame
      .select(col("label").as("actual"),
        array(models.map(m => classifyExpr(m, col("b"))): _*).as("preds"))
      .select(col("actual"), voteFromPreds(col("preds")).as("pred"))
      .groupBy("actual", "pred").agg(count(lit(1)).as("n"))
      .orderBy("actual", "pred")
  }

  /** Gradient-boosted regression (GradientBoostedTrees.scala:1 parity,
    * squared loss): F(x) = f0 + shrink·Σ_m tree_m(x), each round fitting
    * a regression tree to the current residual column (updated in-plan,
    * so round m is one bounded level-training on a frame that never
    * leaves the cluster). Returns (f0, shrink, trees, perRoundMse) —
    * the [[graft.ml.ModelIO.saveGbt]] persistence shape plus the
    * measured per-round training MSEs (provably non-increasing for
    * squared loss with mean leaves; see [[gbt01]]).
    *
    * Predict on a frame binned with the SAME bin edges via
    * [[gbtPredictExpr]]. */
  def trainGbt(data: DataFrame, fts: Seq[Column], yCol: Column,
               rounds: Int, depth: Int, bins: Int, shrink: Double)
      : (Double, Double, Seq[RModel], Seq[Double]) = {
    var frame = binForRegression(data, fts, yCol, bins)
    val f0 = frame.agg(avg("y")).head.getDouble(0)
    // r16: staged residual projection over the one binned checkpoint
    // (same IEEE ops and scan order → bit-identical aggregates), no
    // per-round full-frame re-materialization
    frame = frame.withColumn("y", col("y") - f0)
    val trees = scala.collection.mutable.ArrayBuffer.empty[RModel]
    val mses = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to rounds) {
      val tree = trainRegressionBinned(frame, d = fts.length, depth, bins)
      trees += tree
      frame = frame
        .select(col("b"),
          (col("y") - lit(shrink) * regressExpr(tree, col("b"))).as("y"),
          col("w"), lit(0).as("node"))
      mses += frame.agg(avg(col("y") * col("y"))).head.getDouble(0)
    }
    (f0, shrink, trees.toSeq, mses.toSeq)
  }

  /** Ensemble prediction over a binned feature column: the whole model
    * lives in the plan (a when-chain per tree), map-only application. */
  def gbtPredictExpr(f0: Double, shrink: Double, trees: Seq[RModel],
                     b: Column): Column =
    trees.foldLeft(lit(f0))((acc, t) => acc + lit(shrink) * regressExpr(t, b))

  /** The reference's pseudo-residual −∂loss/∂F as a pure column
    * (mllib/tree/loss: SquaredError.scala:1, AbsoluteError.scala:1,
    * LogLoss.scala:1). For "logistic" the target must already be in
    * {−1,+1} (the Classification remap 2y−1, GradientBoostedTrees
    * .scala:66, happens in the caller). "absolute" keeps the
    * reference's tie convention: residual exactly 0 → +1. */
  private def pseudoResidual(loss: String, y: Column, f: Column): Column =
    loss match {
      case "squared"  => y - f
      case "absolute" => when(y - f < 0, lit(-1.0)).otherwise(lit(1.0))
      case "logistic" => lit(4.0) * y / (lit(1.0) + exp(lit(2.0) * y * f))
      case other => throw new IllegalArgumentException(
        s"loss '$other' (supported: squared, absolute, logistic)")
    }

  /** Per-row training loss of the current ensemble (Loss.computeError's
    * integrand; the logistic form is the reference's numerically-stable
    * 2·log1p(exp(−2yF)) deviance). */
  private def lossValue(loss: String, y: Column, f: Column): Column =
    loss match {
      case "squared"  => (y - f) * (y - f)
      case "absolute" => abs(y - f)
      case "logistic" => lit(2.0) * log1p(exp(lit(-2.0) * y * f))
      case other => throw new IllegalArgumentException(s"loss '$other'")
    }

  /** Loss-generalized gradient boosting (GradientBoostedTrees.scala:120
    * `boost` parity): tree 0 is fit on the RAW target with ensemble
    * weight 1.0 (the reference's firstTreeWeight), every later tree on
    * the CURRENT ensemble's pseudo-residual with weight `shrink`, and
    * leaves are mean pseudo-residuals — Stochastic Gradient Boosting,
    * NOT TreeBoost: the reference documents (GradientBoostedTrees
    * .scala:40 and the baseLearnerWeights note at :174) that leaf
    * values are not refit per loss. `loss` ∈ squared | absolute |
    * logistic (AbsoluteError = LAD regression, LogLoss = binary
    * classification over ±1 labels; predict the class as sign(F)).
    *
    * Scale shape is dt01's: each round = one bounded level-cube
    * groupBy per tree level plus one map-only residual update, the
    * driver holds only (trees × nodes) doubles, rows never leave the
    * cluster. Per-round losses are one avg aggregate each.
    *
    * For `logistic` with 0 < shrink ≤ 1 the training deviance is
    * PROVABLY non-increasing round over round (and below the F=0
    * prior 2·log 2): the deviance is pointwise 2-smooth in F
    * (L″ = 8σ(1−σ) ≤ 2), so a leaf stepping its n points by
    * ν·p̄ (mean pseudo-residual p̄, the leaf's value) changes it by
    * ΔL ≤ Σᵢ(−pᵢ·ν·p̄) + (2/2)·n·ν²p̄² = −n·ν(1−ν)·p̄² ≤ 0; tree 0's
    * raw-label fit is the same bound at ν=1 with g(0) = −2y giving
    * ΔL ≤ −n·μ² ≤ 0. gbt02 turns this theorem into its oracle flags.
    *
    * @return (trees paired with their ensemble weights, per-round mean
    *         training loss, final frame (b, y, F, w) for serving) */
  def trainGbtLoss(data: DataFrame, fts: Seq[Column], yCol: Column,
                   rounds: Int, depth: Int, bins: Int, shrink: Double,
                   loss: String, track: Boolean = true)
      : (Seq[(RModel, Double)], Seq[Double], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(shrink > 0 && shrink <= 1, s"shrink must be in (0,1], got $shrink")
    pseudoResidual(loss, lit(0), lit(0)) // validate the loss name eagerly
    // r16: ONE checkpoint (the binned base) for the whole boost. The
    // ensemble margin F is carried as a staged projection built tree by
    // tree — F_m = F_{m-1} + ν·t_m(b), the same left-to-right IEEE
    // additions the former per-round re-materialization stored — so
    // every cube/loss job scans the SAME checkpointed partitions in the
    // same order and all sums stay bit-identical, while the loop stops
    // paying one full-frame localCheckpoint write per round for a
    // column that is a cheap when-chain over `b`.
    var frame = binForRegression(data, fts, yCol, bins)
      .select(col("b"), col("y"), lit(0.0).as("F"), col("w"))
    val weights = 1.0 +: Seq.fill(rounds - 1)(shrink)
    val trees = scala.collection.mutable.ArrayBuffer.empty[RModel]
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (m <- 0 until rounds) {
      val target = if (m == 0) col("y") else pseudoResidual(loss, col("y"), col("F"))
      val fit = frame.select(col("b"), target.cast("double").as("y"),
        col("w"), lit(0).as("node"))
      val tree = trainRegressionBinned(fit, d = fts.length, depth, bins)
      trees += tree
      frame = frame.select(col("b"), col("y"),
          (col("F") + lit(weights(m)) * regressExpr(tree, col("b"))).as("F"),
          col("w"))
      if (track) losses += frame.agg(avg(lossValue(loss, col("y"), col("F"))))
        .head.getDouble(0)
    }
    (trees.toSeq.zip(weights), losses.toSeq, frame)
  }

  /** Registered pass (r12): 4-round depth-2 LogLoss classification GBT
    * (mllib/tree/loss/LogLoss.scala:1 + GradientBoostedTrees.scala:66's
    * ±1 remap) of "was the line returned-neither-accepted" (l_returnflag
    * = 'N') from gbt01's feature set.
    *
    * FULL oracle via the smoothness theorem proved at [[trainGbtLoss]]:
    * the training deviance provably never increases (tree 0 included)
    * and never exceeds the F=0 prior 2·log 2, so the entry emits
    * per-round `monotone` / `below_prior` flags the oracle asserts as
    * literal TRUE, anchored by the EXACT class counts n_pos/n_neg
    * (integers, recomputed by DuckDB from the raw table — they pin that
    * the remapped target really is the claimed ±1 labeling). The raw
    * per-round deviances stay engine-local (exp is not bit-portable)
    * and are pinned in TreesSpec instead (planted separable recovery). */
  val gbt02 = Q.sql(
    "gbt02_gbt_logloss",
    """WITH c AS (
      |  SELECT CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |         CAST(sum(CASE WHEN l_returnflag <> 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |  FROM lineitem)
      |SELECT CAST(r AS INT) AS round, n_pos, n_neg,
      |  TRUE AS monotone, TRUE AS below_prior
      |FROM c, range(0, 4) t(r)
      |ORDER BY round""".stripMargin) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val y = when(col("l_returnflag") === "N", 1.0).otherwise(-1.0)
    val (_, losses, _) = trainGbtLoss(li, fts, y,
      rounds = 4, depth = 2, bins = 32, shrink = 0.5, loss = "logistic")
    val prior = 2.0 * math.log(2.0)
    // flags from the measured per-round deviances: the theorem is exact
    // real arithmetic; eps absorbs double-agg summation-order noise
    val eps = (a: Double) => a * (1 + 1e-9) + 1e-12
    val flags = losses.zipWithIndex.map { case (l, m) =>
      val prev = if (m == 0) prior else losses(m - 1)
      (m, l <= eps(prev), l <= eps(prior))
    }.toDF("round", "monotone", "below_prior")
    val counts = li.agg(
      sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("l_returnflag") =!= "N", 1L).otherwise(0L)).as("n_neg"))
    flags.crossJoin(counts)
      .select(col("round"), col("n_pos"), col("n_neg"),
        col("monotone"), col("below_prior"))
      .orderBy("round")
  }.withProd { (s, dir) =>
    // production path: boost with per-round deviance tracking OFF and
    // serve the classification (sign of the final ensemble margin)
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val y = when(col("l_returnflag") === "N", 1.0).otherwise(-1.0)
    val (_, _, frame) = trainGbtLoss(li, fts, y,
      rounds = 4, depth = 2, bins = 32, shrink = 0.5, loss = "logistic",
      track = false)
    frame.select(col("y"), signum(col("F")).as("pred"))
  }

  /** Registered pass (r12): 4-round depth-2 LAD (absolute-error) GBT of
    * the scaled extended price — the third reference loss
    * (mllib/tree/loss/AbsoluteError.scala:1) on the same binned
    * residual-update trainer as gbt01/gbt02: tree 0 fits the raw
    * target, later trees fit the ±1 sign pseudo-residual with mean
    * leaves (Stochastic Gradient Boosting, leaves NOT refit per loss —
    * the reference's own documented design).
    *
    * Unlike LogLoss there is NO smoothness theorem for LAD with mean
    * leaves, so the flags are MEASURED claims the driver re-checks
    * every round against deterministic values: `monotone` (per-round
    * training MAD non-increasing — holds with strict decreases at both
    * SFs) and `below_initial` (every round far under the F=0 prior:
    * tree 0's raw-target fit halves the MAD, 53.05 → 26.08 at sf0.01).
    * The anchor `mad0` is the exact-decimal F=0 loss (gbt01's moment
    * discipline — order-independent decimal sum, identical final
    * double ops), DuckDB-recomputed from the raw table. TreesSpec pins
    * planted recovery for the absolute loss separately. */
  val gbt03 = Q.sql(
    "gbt03_gbt_lad",
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(ay) AS DOUBLE) AS say
      |  FROM (SELECT abs(CAST(l_extendedprice / 1000.0 AS DECIMAL(18,6))) AS ay
      |        FROM lineitem))
      |SELECT CAST(r AS INT) AS round, round(say / n, 6) AS mad0,
      |  TRUE AS monotone, TRUE AS below_initial
      |FROM m, range(1, 5) t(r)
      |ORDER BY round""".stripMargin) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val (_, losses, _) = trainGbtLoss(li, fts, col("l_extendedprice") / 1000.0,
      rounds = 4, depth = 2, bins = 32, shrink = 0.5, loss = "absolute")
    val anchor = li
      .select(abs((col("l_extendedprice") / 1000.0).cast("decimal(18,6)")).as("ay"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("ay")).cast("double").as("say"))
      .select((col("say") / col("n")).as("mad0raw"),
        round(col("say") / col("n"), 6).as("mad0"))
    val mad0 = anchor.head.getDouble(0)
    val eps = (a: Double) => a * (1 + 1e-9) + 1e-12
    val flags = losses.zipWithIndex.map { case (l, m) =>
      val prev = if (m == 0) mad0 else losses(m - 1)
      (m + 1, l <= eps(prev), l <= eps(mad0))
    }.toDF("round", "monotone", "below_initial")
    flags.crossJoin(anchor.select("mad0"))
      .select(col("round"), col("mad0"), col("monotone"), col("below_initial"))
      .orderBy("round")
  }.withProd { (s, dir) =>
    // production path: LAD boost with loss tracking OFF, serving the
    // final ensemble prediction frame
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val (_, _, frame) = trainGbtLoss(li, fts, col("l_extendedprice") / 1000.0,
      rounds = 4, depth = 2, bins = 32, shrink = 0.5, loss = "absolute",
      track = false)
    frame.select(col("y"), col("F").as("pred"))
  }

  /** Registered pass: 4-round depth-2 gradient-boosted regression of the
    * scaled extended price (GradientBoostedTrees.scala:1 parity,
    * squared loss: each round fits a regression tree to the CURRENT
    * residual column — updated in-plan, shrinkage 0.5 — so round m is
    * dt01's bounded level-training on a frame that never leaves the
    * cluster).
    *
    * FULL oracle via the boosting invariant (the q30/q41 claim pattern):
    * squared-loss GBT with mean leaves provably never increases training
    * MSE (per leaf with mean μ and shrinkage ν: ΔSSE = −ν(2−ν)·n_leaf·μ²
    * ≤ 0), so the entry emits per-round monotone and below-initial flags
    * plus the INITIAL MSE as an exact-decimal anchor ((Σy² − Σy·(Σy/n))/n
    * — rg01's moment discipline, order-independent so both engines run
    * identical doubles through identical ops); DuckDB recomputes the
    * anchor from the raw table and asserts the flags as literal TRUE.
    * The raw per-round MSE path stays pinned in TreesSpec (planted-step
    * exact recovery + non-increasing MSE). */
  val gbt01 = Q.sql(
    "gbt01_gbt_regression",
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(y * y) AS DOUBLE) AS syy
      |  FROM (SELECT CAST(l_extendedprice / 1000.0 AS DECIMAL(18,6)) AS y
      |        FROM lineitem))
      |SELECT CAST(r AS INT) AS round,
      |  round((syy - sy * (sy / n)) / n, 6) AS mse0,
      |  TRUE AS monotone, TRUE AS below_initial
      |FROM m, range(1, 5) t(r)
      |ORDER BY round""".stripMargin) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val shrink = 0.5
    var frame = binForRegression(li, fts, col("l_extendedprice") / 1000.0, bins = 32)
    // F0 = global mean
    val f0 = frame.agg(avg("y")).head.getDouble(0)
    // r16: the residual column stays a staged projection over the one
    // binned checkpoint (same per-row IEEE ops, same scan order → every
    // aggregate bit-identical); the loop no longer re-materializes the
    // full frame once per round just to store y − ν·t_m(b).
    frame = frame.withColumn("y", col("y") - f0)
    val mseInit = frame.agg(avg(col("y") * col("y"))).head.getDouble(0)
    val mses = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    for (m <- 1 to 4) {
      val tree = trainRegressionBinned(frame, d = fts.length, depth = 2, bins = 32)
      frame = frame
        .select(col("b"), (col("y") - lit(shrink) * regressExpr(tree, col("b"))).as("y"),
          col("w"), lit(0).as("node"))
      mses += ((m, frame.agg(avg(col("y") * col("y"))).head.getDouble(0)))
    }
    // flags from the measured per-round MSEs (aggregates computed in the
    // cluster; the comparison is driver arithmetic on those bounded
    // values) — epsilon absorbs double-agg summation-order noise when a
    // round's true decrease is ~0 (no split found)
    val eps = (a: Double) => a * (1 + 1e-9) + 1e-12
    val flags = mses.toSeq.map { case (m, v) =>
      val prev = if (m == 1) mseInit else mses(m - 2)._2
      (m, v <= eps(prev), v <= eps(mseInit))
    }.toDF("round", "monotone", "below_initial")
    // the exact-decimal anchor, computed in-plan with the oracle's ops
    val anchor = li
      .select((col("l_extendedprice") / 1000.0).cast("decimal(18,6)").as("y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .select(round((col("syy") - col("sy") * (col("sy") / col("n"))) / col("n"), 6)
        .as("mse0"))
    flags.crossJoin(anchor)
      .select(col("round"), col("mse0"), col("monotone"), col("below_initial"))
      .orderBy("round")
  }.withProd { (s, dir) =>
    // production path: the same 4-round boost WITHOUT the per-round MSE
    // heads, the initial-MSE measurement, and the exact-decimal anchor
    // aggregate; serves the ensemble prediction F0 + ν·Σ trees
    val li = Tables.lineitem(s, dir)
    val fts = Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
      year(col("l_shipdate")))
    val shrink = 0.5
    var frame = binForRegression(li, fts, col("l_extendedprice") / 1000.0, bins = 32)
    val f0 = frame.agg(avg("y")).head.getDouble(0)
    // r16: staged residual projection, one checkpoint total (see the
    // gated entry's note)
    frame = frame.withColumn("y", col("y") - f0)
    val trees = scala.collection.mutable.ArrayBuffer.empty[RModel]
    for (_ <- 1 to 4) {
      val tree = trainRegressionBinned(frame, d = fts.length, depth = 2, bins = 32)
      trees += tree
      frame = frame
        .select(col("b"), (col("y") - lit(shrink) * regressExpr(tree, col("b"))).as("y"),
          col("w"), lit(0).as("node"))
    }
    frame.select(gbtPredictExpr(f0, shrink, trees.toSeq, col("b")).as("pred"))
  }

  /** Registered pass (r11): dt01's configuration trained with ENTROPY
    * impurity — the same level-cube machinery, the entropy gain
    * function, and a FULL value oracle via the parameterized
    * [[dtOracleSql]] replay. Cross-engine soundness is the widened
    * 1e-9 band + the 2e-9 gain-gap AND positivity-window guards
    * asserted IN this registered run (log2 is not bit-portable across
    * libms; see [[dtOracleSql]]); TreesSpec separately proves the two
    * impurities genuinely differ on a planted corpus, so this is not
    * dt01 re-labeled. */
  val dt02 = Q.sql("dt02_entropy_tree", dtOracleSql("entropy")) { (s, dir) =>
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val (assigned, model) = train(
      li,
      Seq(col("l_quantity"), col("l_discount"), col("l_tax"),
        year(col("l_shipdate"))),
      col("l_returnflag"), depth = 3, bins = 32,
      guardGainGaps = true, impurity = "entropy", gainGapWidth = 2e-9)
    val leafPred = model.leafClass.toSeq.toDF("node", "pred")
    assigned.groupBy("node", "label").agg(count(lit(1)).as("c"))
      .join(broadcast(leafPred), Seq("node"))
      .groupBy(col("node").as("leaf"), col("pred"))
      .agg(sum("c").as("n"),
        sum(when(col("label") === col("pred"), col("c")).otherwise(0L)).as("n_correct"))
      .orderBy("leaf")
  }

  val all: Seq[Q] = Seq(dt01, dt02, rf01, gbt01, gbt02, gbt03)
}
