package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, JaroWinkler, MisraGries, NfcNormalize, PinnedCosine, PinnedKmeansBest, PinnedSeedArgmin, PinnedSqDist, RepStats, ShingleSet, SigAgreeCount, SortedOverlapCount, SortedPairs, SqEuclidean, TopK, TrigramCountAgg, TrigramLmScore, VocabTf}
import graft.mine.DrainMineAgg

/** The library's `SparkSessionExtensions` injection point — the idiomatic
  * way a Spark-native library ships its Catalyst surface. Every graft
  * expression and aggregate becomes a built-in of any session created with
  *
  *   `--conf spark.sql.extensions=graft.GraftExtensions`
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`): the
  * names resolve in SQL text, views, and downstream sessions with no
  * per-query registration. `GraftSession` wires this in by default; the
  * per-operator `register(...)` calls remain as idempotent fallbacks for
  * foreign sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn(graft.functions.GraftFunctions.CosineName,
      classOf[CosineSimilarity], exprs => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(fn(SortedOverlapCount.Name,
      classOf[SortedOverlapCount], exprs => SortedOverlapCount(exprs(0), exprs(1))))
    ext.injectFunction(fn(SigAgreeCount.Name,
      classOf[SigAgreeCount], exprs => SigAgreeCount(exprs(0), exprs(1))))
    ext.injectFunction(fn(DrainMineAgg.Name,
      classOf[DrainMineAgg], exprs => DrainMineAgg(exprs.head)))
    ext.injectFunction(fn(MisraGries.Name,
      classOf[MisraGries], MisraGries.build))
    ext.injectFunction(fn(RepStats.Name,
      classOf[RepStats], exprs => RepStats(exprs.head)))
    ext.injectFunction(fn(NfcNormalize.Name,
      classOf[NfcNormalize], exprs => NfcNormalize(exprs.head)))
    ext.injectFunction(fn(TopK.Name,
      classOf[TopK], TopK.build))
    ext.injectFunction(fn(ShingleSet.Name,
      classOf[ShingleSet], exprs => ShingleSet(exprs(0), exprs(1))))
    ext.injectFunction(fn(TrigramLmScore.Name,
      classOf[TrigramLmScore], exprs => TrigramLmScore(exprs(0), exprs(1))))
    ext.injectFunction(fn(TrigramCountAgg.Name,
      classOf[TrigramCountAgg], exprs => TrigramCountAgg(exprs.head)))
    ext.injectFunction(fn(JaroWinkler.Name,
      classOf[JaroWinkler], exprs => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction(fn(VocabTf.Name,
      classOf[VocabTf], exprs => VocabTf(exprs(0), exprs(1))))
    ext.injectFunction(fn(SortedPairs.Name,
      classOf[SortedPairs], exprs => SortedPairs(exprs.head)))
    ext.injectFunction(fn(SqEuclidean.Name,
      classOf[SqEuclidean], exprs => SqEuclidean(exprs(0), exprs(1))))
    ext.injectFunction(fn(PinnedCosine.Name,
      classOf[PinnedCosine], exprs => PinnedCosine(exprs(0), exprs(1))))
    ext.injectFunction(fn(PinnedSqDist.Name,
      classOf[PinnedSqDist], exprs => PinnedSqDist(exprs(0), exprs(1))))
    ext.injectFunction(fn(PinnedKmeansBest.Name,
      classOf[PinnedKmeansBest],
      exprs => PinnedKmeansBest(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(fn(PinnedSeedArgmin.Name,
      classOf[PinnedSeedArgmin],
      exprs => PinnedSeedArgmin(exprs(0), exprs(1), exprs(2))))
    // whole-operator nodes (custom-operator ladder rung (c))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer rules (the Rule[LogicalPlan] rung): algebraic rewrites
    // over graft expressions — nfc idempotence collapse
    ext.injectOptimizerRule(_ => graft.plans.CollapseNfc)
  }
}
