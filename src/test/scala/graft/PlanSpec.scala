package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the shapes the engine PROMISES at
  * scale (broadcast dim joins, scan-level filters, top-k fusion, no
  * shuffle in pure projections) must survive refactors. String-level
  * checks on the executed plan — crude but effective tripwires. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSession.sf).queryExecution.executedPlan.toString

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), "dim join must broadcast")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join expected at this scale")
  }

  test("q02: filters reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("DataFilters: [isnotnull(l_quantity"), s"filter not at scan:\n$p")
  }

  test("q04: top-k fuses into TakeOrderedAndProject") {
    assert(plan("q04_topk").contains("TakeOrderedAndProject"))
  }

  test("q11: pure projection plans no shuffle except the result ordering") {
    val p = plan("q11_clean_text")
    val exchanges = p.split("\n").count(_.contains("Exchange"))
    assert(exchanges <= 1, s"projection should only range-shuffle for ORDER BY, got $exchanges:\n$p")
  }

  test("q01: aggregation is two-phase (partial before shuffle)") {
    val p = plan("q01_pricing_agg")
    assert(p.contains("HashAggregate"), "hash aggregate expected")
    assert(p.split("HashAggregate").length >= 3, "partial + final aggregation expected")
  }

  test("q16/q17: registered mining queries plan no one-task wall") {
    Seq("q16_mine_templates", "q17_match_counts").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SinglePartition"),
        s"$q must use the parallel mining path (found a single-partition exchange):\n$p")
    }
  }

  test("q44/q18: exactly one key shuffle plus the result ordering") {
    Seq("q44_sessionize", "q18_dedup_exact").foreach { q =>
      val p = plan(q)
      val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
      assert(hash == 1, s"$q promises ONE key shuffle, found $hash:\n$p")
    }
  }

  test("q45: native as-of merge — two co-partitioning shuffles, no window/union") {
    val p = plan("q45_asof_join")
    val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hash == 2, s"one exchange per join side expected, found $hash:\n$p")
    assert(p.contains("AsOfJoin"), s"native AsOfJoinExec missing:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"),
      s"union+window formulation must not appear:\n$p")
  }

  test("q55: curation pipeline is one scan plus two keyed shuffles") {
    val p = plan("q55_curate")
    assert(p.split("\n").count(_.contains("Scan parquet")) == 1,
      s"q55 promises a single documents scan:\n$p")
    val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hash == 2, s"dedup window + final aggregate = two key shuffles, got $hash:\n$p")
  }

  test("q56: tolerance as-of keeps the single-shuffle union-trick plan") {
    val p = plan("q56_asof_tolerance")
    val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hash == 1, s"q56 promises ONE key shuffle, got $hash:\n$p")
  }

  test("q12: correlation runs as a codegen'd hash aggregate, never RowMatrix") {
    val p = plan("q12_corr")
    assert(p.contains("HashAggregate"), "moment sums must be a hash aggregate")
    assert(!p.contains("DeserializeToObject") && !p.contains("MapPartitions"),
      s"corr must stay in Tungsten rows (no RDD/object fallback):\n$p")
  }

  test("q23: native cosine expression is in the plan (codegen path)") {
    val p = plan("q23_ann_brute")
    assert(p.contains("graft_cosine"), s"native cosine missing:\n$p")
  }

  test("q90: native NFC expression is in the plan, no UDF/object fallback") {
    val p = plan("q90_unicode_norm")
    assert(p.contains("graft_nfc"), s"native nfc missing:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("DeserializeToObject"),
      s"nfc must stay a native projection:\n$p")
  }

  test("q99: chunking plans no shuffle except the result ordering") {
    val p = plan("q99_chunk_windows")
    val exchanges = p.split("\n").count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"chunker should only range-shuffle for ORDER BY, got $exchanges:\n$p")
  }

  test("q100: upsert plans exactly one join") {
    val p = plan("q100_upsert")
    val joins = p.split("\n").count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
      l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"upsert promises one full-outer join, got $joins:\n$p")
  }

  test("q111: star join broadcasts every dimension (fact never shuffles for joins)") {
    val p = plan("q111_star_join")
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) == 4,
      s"all four dimension joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge in the star join:\n$p")
  }

  test("q93: winsorize cut table joins broadcast (clamp never shuffles the fact side)") {
    val p = plan("q93_winsorize")
    assert(p.contains("BroadcastHashJoin"), s"cut-table join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge expected:\n$p")
  }

  test("q163: interval overlap is a bucket EQUI-join, never a nested loop") {
    val p = plan("q163_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketization must prevent the theta-join nested loop:\n$p")
  }

  test("q170: join-size estimate only ever joins the key histograms") {
    val p = plan("q170_join_size")
    // two pre-aggregation shuffles; the full-outer merge REUSES their
    // partitioning (no third key exchange before the join)
    val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hash == 2, s"expected exactly the two histogram shuffles, got $hash:\n$p")
  }

  test("q167: trend centering joins the per-group min frame by broadcast") {
    val p = plan("q167_trend_lines")
    assert(p.contains("BroadcastHashJoin"), s"mins join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge expected:\n$p")
  }

  test("q149: EWMA plans one key shuffle plus the result ordering only") {
    val p = plan("q149_ewma")
    val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hash == 1, s"one window shuffle promised, got $hash:\n$p")
  }

  test("round-8 rank folds: one corpus-scale shuffle, no sort-merge join") {
    // the distinct-value doubled-rank family: the ONLY row-scale
    // exchange is the value-fold groupBy; everything after runs on the
    // distinct-value frame (its single-partition window is bounded by
    // value cardinality, documented at each operator)
    Seq("q362_cliffs_delta", "q363_brunner_munzel", "q374_cucconi",
      "q367_ansari_bradley").foreach { q =>
      val p = plan(q)
      val hash = p.split("\n").count(_.contains("Exchange hashpartitioning"))
      assert(hash <= 2, s"$q: value fold promises ≤2 hash exchanges, got $hash:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge join:\n$p")
    }
  }

  test("circular stats: two-phase aggregate, literal-bounded after the hour fold") {
    Seq("q358_rayleigh", "q359_circ_hours").foreach { q =>
      val p = plan(q)
      assert(p.split("HashAggregate").length >= 3,
        s"$q: partial+final aggregation expected:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q must stay join-free at row scale:\n$p")
    }
  }

  test("ratio inference: one unit-fold shuffle; totals are driver scalars") {
    // ≤2, not ==1: when q372 ran earlier in the suite, its PERSISTED
    // unit fold is cache-substituted into q371's identical subtree and
    // the InMemoryRelation recipe repeats the fold's exchange STRING —
    // still one physical shuffle
    val pd = plan("q371_ratio_delta")
    assert(pd.split("\n").count(_.contains("Exchange hashpartitioning")) <= 2,
      s"q371: only the per-unit groupBy may shuffle:\n$pd")
    assert(!pd.contains("SortMergeJoin"))
    // jackknife: the persisted unit fold appears once live and once
    // inside the InMemoryRelation's recipe — two hash-exchange STRINGS,
    // one physical shuffle; the replicate aggregate itself must stay a
    // global two-phase agg (SinglePartition of 1-row partials), never a
    // hashpartitioning on the scalar totals
    val pj = plan("q372_ratio_jackknife")
    assert(pj.split("\n").count(_.contains("Exchange hashpartitioning")) <= 2,
      s"q372: only the (cached) unit fold may hash-shuffle:\n$pj")
    assert(pj.contains("InMemoryTableScan"),
      s"q372 must reuse the persisted unit fold:\n$pj")
    assert(!pj.contains("SortMergeJoin"))
  }

  test("q390 bucketed LOF: pair join is bucket-keyed equi, never a cartesian") {
    val p = plan("q390_lof_bucketed")
    assert(!p.contains("CartesianProduct"),
      s"bucketed LOF must never plan an all-pairs cartesian:\n$p")
    // the seed-assignment fan-out is the only nested-loop (bounded
    // broadcast side: nSeeds rows)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"seed fan-out should ride a broadcast:\n$p")
  }

  test("q391 naive bayes: model-sized sides broadcast; no cartesian") {
    val p = plan("q391_nb_langid")
    assert(!p.contains("CartesianProduct"), s"NB must not plan a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the (token, class) weight join must broadcast the model:\n$p")
  }

  test("q393 winnow pairs: inverted-index self-join stays equi-keyed") {
    val p = plan("q393_winnow_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"winnow candidate generation must be fingerprint-equi-keyed only:\n$p")
  }

  test("q400 JL: sign matrix broadcasts; projection is one corpus shuffle each side") {
    val p = plan("q400_jl_distortion")
    assert(!p.contains("CartesianProduct"), s"JL must not plan a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the k×d sign matrix must broadcast into the term projection:\n$p")
  }
}
