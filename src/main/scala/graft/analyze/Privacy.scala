package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-anonymity audit (Sweeney 2002): how re-identifiable is a dataset
  * under a set of quasi-identifier columns — the privacy gate a
  * training-data release runs next to the PII scrub
  * ([[graft.text.Pii]]): scrubbing direct identifiers is not enough when
  * a (type, day, value-band) combination is unique to one person.
  *
  * Report: equivalence-class count, the minimum class size (the dataset's
  * k), and how many classes / rows sit below the `k` threshold — the rows
  * a release would need to generalize or suppress.
  *
  * Scale shape: ONE hash aggregate on the quasi-identifier tuple, then a
  * 1-row rollup of the class-size frame. Nothing else touches the corpus.
  */
object Privacy {

  /** `(n_rows, n_classes, k_min, classes_below_k, rows_below_k)` for the
    * given quasi-identifier expressions. */
  def kAnonymityReport(df: DataFrame, quasiIds: Seq[Column],
                       k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier required")
    val classes = df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__n"))
    classes.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__n")).as("k_min"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_below_k"))
  }

  /** Distinct l-diversity audit (Machanavajjhala 2007) — k-anonymity's
    * necessary complement: a size-1000 equivalence class is still a leak
    * if all 1000 rows share one SENSITIVE value (the homogeneity attack
    * k-anonymity cannot see). Per quasi-identifier class, `l` = distinct
    * sensitive values; report one row
    * `(n_classes, n_rows, l_min, classes_below_l, rows_below_l)`.
    *
    * Scale shape: one hash aggregate on (quasi-ids, sensitive) — exact
    * distinct via the two-level group-by, no distinct-count sketch — then
    * a class rollup and a 1-row summary. */
  def lDiversityReport(df: DataFrame, quasiIds: Seq[Column],
                       sensitive: Column, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier required")
    // quasi-ids materialize under stable names FIRST: the class rollup
    // re-groups the cell frame, where a computed quasi-id expression
    // (date_trunc, banding) could not re-resolve against its source cols
    val qNames = quasiIds.indices.map(i => s"__q$i")
    val base = df.select(
      quasiIds.zip(qNames).map { case (c, n) => c.as(n) } :+
        sensitive.as("__s"): _*)
    val cells = base.groupBy(qNames.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__n"))
    val classes = cells.groupBy(qNames.map(col): _*)
      .agg(count(lit(1)).as("__l"), sum(col("__n")).as("__rows"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("__rows")).as("n_rows"),
      min(col("__l")).as("l_min"),
      sum(when(col("__l") < l, 1L).otherwise(0L)).as("classes_below_l"),
      sum(when(col("__l") < l, col("__rows")).otherwise(0L)).as("rows_below_l"))
  }

  /** T-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the release-audit ladder after [[kAnonymityReport]] and
    * [[lDiversityReport]]: a class can be large (k-anonymous) and carry
    * several sensitive values (l-diverse) yet still leak if its sensitive
    * DISTRIBUTION differs sharply from the global one (skewness attack —
    * "90% of this class has condition X" when the base rate is 1%).
    * Per quasi-identifier class, t = total-variation distance between the
    * class's categorical sensitive distribution and the global:
    * `t_c = ½ Σ_v |c_cv/n_c − g_v/N|`.
    *
    * Exactness: scaling by `n_c·N` makes every |·| term the exact integer
    * `|c_cv·N − g_v·n_c|`; absent-in-class categories contribute
    * `g_v·n_c`, folded in closed form as `(N − Σ_{v present} g_v)·n_c` —
    * no class×category grid is ever built. One row:
    * `(n_classes, n_rows, t_max, classes_above_t, rows_above_t)` with
    * t_max at 6 dp.
    *
    * Scale shape: one hash aggregate on (quasi-ids, sensitive), a
    * category-bounded broadcast of the global distribution, a class
    * rollup, and a 1-row summary — the corpus is touched once. */
  def tClosenessReport(df: DataFrame, quasiIds: Seq[Column],
                       sensitive: Column, t: Double): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier required")
    require(t > 0 && t < 1, s"t must be in (0,1): $t")
    val qNames = quasiIds.indices.map(i => s"__q$i")
    val base = df.select(
      quasiIds.zip(qNames).map { case (c, n) => c.as(n) } :+
        sensitive.as("__s"): _*)
    val cells = base.groupBy(qNames.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__g"))
    val nAll = cells.agg(sum(col("__c")).as("__tot"))
    // class totals n_c join back to the cells (both sides hash on the
    // quasi-id key — the aggregate's own partitioning is reused, no
    // extra corpus shuffle); the category-bounded global frame and the
    // 1-row N broadcast
    // toDF forces fresh attribute ids: the grouping columns otherwise
    // keep the SAME exprIds as `cells`, and the cells ⋈ classTotals
    // self-join would be ambiguous
    val classTotals = cells.groupBy(qNames.map(col): _*)
      .agg(sum(col("__c")).as("__n"))
      .toDF(qNames :+ "__n": _*)
    def d(c: Column) = c.cast("decimal(38,0)")
    val perClass = cells
      .join(classTotals, qNames)
      .join(broadcast(global), "__s")
      .crossJoin(broadcast(nAll))
      .groupBy(qNames.map(col): _*)
      .agg(max(col("__n")).as("__n"), max(col("__tot")).as("__tot"),
        sum(abs(d(col("__c")) * d(col("__tot")) -
          d(col("__g")) * d(col("__n")))).as("__sum_abs"),
        sum(col("__g")).as("__g_present"))
      // absent-in-class categories enter in closed form as
      // (N − Σ_present g_v)·n_c; t_c is ONE double division of exact
      // integers
      .withColumn("__t",
        (col("__sum_abs").cast("double") +
          (col("__tot") - col("__g_present")).cast("double") *
            col("__n").cast("double")) /
          (lit(2.0) * col("__n").cast("double") * col("__tot").cast("double")))
    perClass.agg(
      count(lit(1)).as("n_classes"),
      sum(col("__n")).as("n_rows"),
      round(max(col("__t")).cast("double"), 6).as("t_max"),
      sum(when(col("__t") > t, 1L).otherwise(0L)).as("classes_above_t"),
      sum(when(col("__t") > t, col("__n")).otherwise(0L)).as("rows_above_t"))
  }

  /** Seeded-Laplace noisy count release — the Laplace mechanism's
    * PLUMBING (sensitivity-1 count + Lap(1/ε) noise) with the noise
    * drawn by inverse CDF from the portable md5 hash of the category
    * and a release tag. A true DP deployment needs fresh randomness per
    * release (a hash-seeded draw is deterministic BY DESIGN here — that
    * is what makes the operator testable and the release reproducible;
    * rotate `releaseTag` per release to re-draw). Output one row per
    * category: `(category, noisy_count, epsilon)` — the TRUE count never
    * leaves the operator.
    *
    * Inverse CDF: `u ∈ (0,1)` from the hash;
    * `noise = −sign(u−½)·ln(1−2|u−½|)/ε`, one pinned double per
    * category over exact integer counts, reported at 3 dp. Scale: one
    * category-bounded count aggregate. */
  def laplaceCounts(df: DataFrame, category: Column, epsilon: Double,
                    releaseTag: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val counts = df.groupBy(category.as("category"))
      .agg(count(lit(1)).as("__c"))
    val u = (graft.operators.Sharding.hash32(
      concat(col("category").cast("string"), lit(":" + releaseTag)))
      .cast("double") + 0.5) / lit(4294967296.0)
    counts
      .withColumn("__n",
        -signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5)) / lit(epsilon))
      .select(col("category"),
        round(col("__c") + col("__n"), 3).as("noisy_count"),
        lit(epsilon).as("epsilon"))
      .orderBy(col("category"))
  }

  /** DP quantile release via the EXPONENTIAL MECHANISM (McSherry &
    * Talwar 2007; the interval form of Smith 2011): candidates are the
    * inter-order-statistic gaps of the per-unit metric, utility
    * `u_i = −|i − q·n|` (how far gap i's rank sits from the target),
    * selection by the Gumbel-max trick —
    * `argmax_i [ε·u_i/2 + ln(len_i) + G_i]` with `G_i = −ln(−ln U_i)`
    * — released value = the winning gap's midpoint. The TRUE order
    * statistics never leave the operator; only n (treated as public,
    * as in [[laplaceCounts]]) and the noisy value do. Like
    * [[laplaceCounts]], randomness is the portable md5 hash of
    * `(rank, releaseTag)` — deterministic BY DESIGN for testability;
    * rotate the tag per release.
    *
    * Cross-engine determinism: ranks/lengths are exact integers; each
    * transcendental output (ln len, the Gumbel) is pinned to a 1e6-scale
    * long before the integer score sum, ties broken by rank. Zero-length
    * gaps (tied order statistics) carry zero probability mass in the
    *  mechanism and are dropped; if ALL gaps are zero (constant metric)
    * the release is the constant itself with zero privacy cost.
    *
    * Scale shape: one unit fold, one range-partitioned global rank
    * ([[graft.operators.Positional.withRowIndex]]), a lag, and a
    * TakeOrdered(1) argmax — no global single-task window. One row:
    * `(n_units, epsilon, q, dp_value)`. */
  def dpQuantile(df: DataFrame, unitCol: Column, valueCol: Column,
                 q: Double, epsilon: Double, releaseTag: String): DataFrame = {
    require(q > 0 && q < 1, s"q must be in (0,1): $q")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val per = df.groupBy(unitCol.as("unit"))
      .agg(sum(round(valueCol * lit(1000000)).cast("long")).as("vq"))
    val ranked = graft.operators.Positional.withRowIndex(
        per.select(col("vq"), col("unit")), Seq(col("vq"), col("unit")), "__r0")
      .select(col("vq"), (col("__r0") + 1L).as("i"))
    val n = per.agg(count(lit(1)).as("n"))
    def pin6(c: Column) = round(c * lit(1e6)).cast("long")
    // successor order statistic via the dense rank (i, i+1) equi-join —
    // NOT a global lead() window, whose SinglePartition sort dies at
    // unit scale; the join shuffles on the rank key only
    val lagged = ranked
      .join(ranked.select((col("i") - 1L).as("i"), col("vq").as("nxt")), "i")
      .filter(col("nxt") > col("vq"))
    val uHash = (graft.operators.Sharding.hash32(
      concat(col("i").cast("string"), lit(":" + releaseTag)))
      .cast("double") + 0.5) / lit(4294967296.0)
    val scored = lagged.crossJoin(broadcast(n))
      .select(col("i"), col("vq"), col("nxt"), col("n"),
        (pin6(lit(epsilon) * -abs(col("i").cast("double") -
            lit(q) * col("n")) / 2.0) +
          pin6(log((col("nxt") - col("vq")).cast("double") / 1e6)) +
          pin6(-log(-log(uHash)))).as("score6"))
    val win = scored.orderBy(col("score6").desc, col("i")).limit(1)
    // constant-metric degenerate: no positive-length gap — release the
    // constant (min == max, zero information beyond the public n)
    val fallback = per.agg(min(col("vq")).as("lo"), max(col("vq")).as("hi"))
    win.select(lit(1).as("__k"), col("vq"), col("nxt"))
      .join(fallback.select(lit(1).as("__k"), col("lo"), col("hi")),
        Seq("__k"), "right")
      .crossJoin(broadcast(n))
      .select(col("n").as("n_units"), lit(epsilon).as("epsilon"),
        lit(q).as("q"),
        round(coalesce((col("vq") + col("nxt")).cast("double") / 2.0,
          col("lo").cast("double")) / 1e6, 6).as("dp_value"))
  }
}
