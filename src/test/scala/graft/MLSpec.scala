package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analyze.{CorrPrune, StratifiedSplit}
import graft.ml.{IsolationForest, Models}
import graft.sources.Tables

class MLSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("stratified split keeps per-stratum fractions and partitions the data") {
    import spark.implicits._
    val events = Tables.events(spark, TestSession.sf)
    val (train, rest) = StratifiedSplit.twoWay(events, "event_type", "event_id", 0.8)
    assert(train.count() + rest.count() == events.count())
    assert(train.join(rest, "event_id").count() == 0, "splits must be disjoint")
    val fracs = train.groupBy($"event_type").count().withColumnRenamed("count", "tr")
      .join(events.groupBy($"event_type").count(), "event_type")
      .select($"tr" / $"count").as[Double].collect()
    fracs.foreach(f => assert(f > 0.6 && f < 0.95, s"stratum fraction $f far from 0.8"))
  }

  test("threeWay split partitions into train/val/test") {
    val events = Tables.events(spark, TestSession.sf)
    val tagged = StratifiedSplit.tagged(events, "event_type", "event_id")
    assert(tagged.count() == events.count())
    val counts = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("corrPairs matches brute-force Pearson (decimal-moment fast path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = (1 to 400).map { i =>
      val x = i.toDouble / 7.0
      (x, x * 0.5 + rnd.nextDouble() * 10, rnd.nextDouble() * 100)
    }
    val df = data.toDF("a", "b", "c")
    val got = CorrPrune.corrPairs(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val cols = Map("a" -> data.map(_._1), "b" -> data.map(_._2), "c" -> data.map(_._3))
    for (((a, b), v) <- got) {
      // decimal(12,6) per-row quantization bounds the difference at ~1e-6
      assert(math.abs(v - pearson(cols(a), cols(b))) < 1e-4, s"corr($a,$b)=$v off brute force")
    }
  }

  test("corrPrune drops a synthetic duplicated column under the earlier-column rule") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toDouble, i * 2.0 + 0.001 * (i % 7), (i % 17).toDouble))
      .toDF("x", "x_dup", "noise")
    val drops = CorrPrune.toDrop(df, Seq("x", "x_dup", "noise"), 0.9)
    assert(drops == Seq("x_dup"))
    assert(CorrPrune.prune(df, Seq("x", "x_dup", "noise"), 0.9).columns.toSeq == Seq("x", "noise"))
  }

  test("LR + metrics: learns a separable synthetic problem; metrics well-formed") {
    import spark.implicits._
    val df = (1 to 400).map { i =>
      val label = if (i % 2 == 0) 1 else 0
      (i.toLong, label + scala.util.Random.nextDouble() * 0.1, label)
    }.toDF("id", "f", "label")
    val data = Models.assemble(df, Seq("f"), "label")
    val m = Models.fitLogisticRegression(data)
    val metrics = Models.binaryMetrics(m.transform(data)).collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(metrics("accuracy").get > 0.95)
    assert(metrics("auc").get > 0.95)
    Seq("precision", "recall").foreach(k =>
      assert(metrics(k).get >= 0.0 && metrics(k).get <= 1.0))
  }

  test("exactAuc matches hand-computed Mann-Whitney values, ties included") {
    import spark.implicits._
    // scores: pos {0.9, 0.5}, neg {0.5, 0.1} — pair wins: (0.9>0.5), (0.9>0.1),
    // (0.5>0.1) = 3, tie (0.5,0.5) = 0.5 → AUC = 3.5/4 = 0.875
    val df = Seq((0.9, 1.0), (0.5, 1.0), (0.5, 0.0), (0.1, 0.0)).toDF("s", "label")
    assert(math.abs(Models.exactAuc(df, col("s")) - 0.875) < 1e-12)
    // perfect separation and all-tied degenerate cases
    val sep = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("s", "label")
    assert(math.abs(Models.exactAuc(sep, col("s")) - 1.0) < 1e-12)
    val tied = Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0)).toDF("s", "label")
    assert(math.abs(Models.exactAuc(tied, col("s")) - 0.5) < 1e-12)
  }

  test("weighted sufficient-statistics fit matches the plain fit") {
    import spark.implicits._
    // discrete feature space with heavy duplication — the compression target
    // labels drawn from a logistic model, NOT thresholded: separable data
    // has no finite optimum and the two fits would drift apart at maxIter
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map { _ =>
      val a = rnd.nextInt(4); val b = rnd.nextInt(3)
      val label = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-(a - b - 1)))) 1 else 0
      (a.toDouble, b.toDouble, label)
    }.toDF("a", "b", "label")
    val cols = Seq("a", "b")
    val plain = Models.fitLogisticRegression(Models.assemble(df, cols, "label"))
    val compressed = Models.compressWeighted(df, cols, "label")
    assert(compressed.count() <= 4 * 3 * 2, "compression must bound rows by the feature space")
    val weighted = Models.fitLogisticRegression(
      Models.assemble(compressed, cols, "label"), weightCol = Some("weight"))
    plain.coefficients.toArray.zip(weighted.coefficients.toArray).foreach { case (p, w) =>
      assert(math.abs(p - w) < 1e-3, s"coefficient drift: $p vs $w")
    }
    assert(math.abs(plain.intercept - weighted.intercept) < 1e-3)
  }

  test("AUC single-class guard yields null (L6)") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, i.toDouble, 1)).toDF("id", "f", "label")
    val data = Models.assemble(df, Seq("f"), "label")
    val m = Models.fitLogisticRegression(data, maxIter = 10)
    val metrics = Models.binaryMetrics(m.transform(data)).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(metrics("auc").isEmpty, "AUC must be null for single-class labels")
  }

  test("lrImportance lists every feature, ordered by |coefficient| descending (L7)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map { i =>
      val label = i % 2
      (label * 4.0 + rnd.nextDouble(), rnd.nextDouble(), label)
    }.toDF("signal", "noise", "label")
    val data = Models.assemble(df, Seq("signal", "noise"), "label")
    val imp = Models.lrImportance(spark, Models.fitLogisticRegression(data, maxIter = 50),
      Seq("signal", "noise")).collect()
    assert(imp.map(_.getString(0)).toSet == Set("signal", "noise"))
    assert(imp.head.getString(0) == "signal", "separating feature must rank first")
    val vals = imp.map(_.getDouble(1)).toSeq
    assert(vals == vals.sorted.reverse, s"importances must be non-increasing: $vals")
  }

  test("RF importance concentrates on the informative feature") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      val label = i % 2
      (label * 10.0 + rnd.nextDouble(), rnd.nextDouble(), label)
    }.toDF("signal", "noise", "label")
    val data = Models.assemble(df, Seq("signal", "noise"), "label")
    val m = Models.fitRandomForest(data, numTrees = 20)
    val imp = Models.rfImportance(spark, m, Seq("signal", "noise")).collect()
    assert(imp.head.getString(0) == "signal")
  }

  test("isolation forest flags injected outliers") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val normal = (1 to 950).map(_ => (rnd.nextGaussian(), rnd.nextGaussian(), false))
    val outliers = (1 to 50).map(_ => (12.0 + rnd.nextGaussian(), -12.0 + rnd.nextGaussian(), true))
    val df = rnd.shuffle(normal ++ outliers).toDF("x", "y", "truth")
    val scored = IsolationForest.fitPredict(df, Seq("x", "y"), numTrees = 50, contamination = 0.05)
    val flaggedOutliers = scored.filter($"truth" && $"is_anomaly" === 1).count()
    assert(flaggedOutliers >= 40, s"only $flaggedOutliers/50 injected outliers flagged")
    val falsePos = scored.filter(!$"truth" && $"is_anomaly" === 1).count()
    assert(falsePos < 30, s"too many false positives: $falsePos")
  }

  test("PCA(k=2) on embeddings yields 2 components with nonzero spread") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val proj = Models.pcaProjectArray(emb, "embedding", 2)
      .select(element_at($"pc", 1).as("pc1"), element_at($"pc", 2).as("pc2"))
    val stats = proj.agg(stddev_samp($"pc1"), stddev_samp($"pc2")).head()
    assert(stats.getDouble(0) > 0 && stats.getDouble(1) > 0)
    assert(stats.getDouble(0) >= stats.getDouble(1),
      "components must be ordered by explained variance")
  }

  test("pinned power-iteration PCA: variance parity with spark.ml, ordering, bit-exact invariance") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    // NOTE the embeddings' spectrum is near-isotropic (λ2/λ1 ≈ 0.99 at
    // sf0.01), so no fixed-iteration power method can pin spark.ml's
    // exact axes — the near-equal top directions are barely
    // distinguishable. What the operator must deliver: projections that
    // capture top-of-spectrum variance (parity with the SVD path),
    // variance-ordered components, and a bit-exact deterministic
    // recurrence (the property the SQL oracle certifies).
    val ml = Models.pcaProjectArray(emb, "embedding", 2)
      .select(element_at($"pc", 1).as("m1"))
    val pin = graft.ml.PinnedPca.project(emb, "vec_id", "embedding", 2)
      .select($"vec_id", element_at($"pc", 1).as("p1"), element_at($"pc", 2).as("p2"))
    val mlVar = ml.agg(var_samp($"m1")).head().getDouble(0)
    val r = pin.agg(var_samp($"p1"), var_samp($"p2")).head()
    assert(r.getDouble(0) > 0.9 * mlVar,
      s"pc1 variance ${r.getDouble(0)} far below spark.ml's $mlVar")
    assert(r.getDouble(0) >= r.getDouble(1),
      "components must be ordered by explained variance")
    // bit-exact partition invariance — the oracle-ability property
    val a = graft.ml.PinnedPca.project(emb.repartition(32), "vec_id", "embedding", 2)
      .select($"vec_id", $"pc").collect().map(x => (x.getLong(0), x.getSeq[Double](1))).toMap
    val b = graft.ml.PinnedPca.project(emb, "vec_id", "embedding", 2)
      .select($"vec_id", $"pc").collect().map(x => (x.getLong(0), x.getSeq[Double](1))).toMap
    assert(a == b)
  }
}
