package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** MinHash-LSH band-configuration planner: for each candidate `(bands,
  * rows_per_band)` config, the expected true-positive catch and
  * false-positive candidate load over THIS corpus's measured pair-
  * similarity distribution — the S-curve `p(J) = 1 − (1 − J^r)^b`
  * (Leskovec-Rajaraman-Ullman) evaluated against a blocked calibration
  * sample instead of a guessed similarity mix. Turns "which (b, r) do I
  * run [[Dedup.minHashLsh]] with" from folklore into a one-query
  * costed answer.
  *
  * Calibration sample: pairs sharing their FIRST token (an equi-join
  * block — cheap, biased toward related pairs, which is exactly the
  * region the curve must resolve). Exact token-set Jaccard per pair via
  * bounded in-row `array_intersect` — no token-level explode join.
  *
  * Determinism: the per-(config, bin) detection probabilities are
  * computed ONCE in Scala ([[detectProb]], 9-dp pinned) and embedded as
  * identical literals in this plan and the DuckDB oracle; per-bin
  * expected counts pin to 6-dp longs, so sums are exact.
  *
  * Scale shape: one corpus scan to the blocked self-join (block sizes
  * are first-token frequencies — the head block bounds the quadratic;
  * a production planner would sample blocks, documented), then a
  * 10-row histogram crossed with a |configs|-row literal table. */
object LshCurve {

  /** `1 − (1 − mid^r)^b` at the bin midpoint, pinned to 9 dp. */
  def detectProb(mid: Double, b: Int, r: Int): Double =
    java.math.BigDecimal.valueOf(1.0 - math.pow(1.0 - math.pow(mid, r), b))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The 10 per-bin probabilities (bin midpoints .05, .15, …, .95). */
  def pTable(b: Int, r: Int): Seq[Double] =
    (0 until 10).map(k => detectProb((k + 0.5) / 10.0, b, r))

  def curve(df: DataFrame, idCol: Column, textCol: Column,
            configs: Seq[(Int, Int)]): DataFrame = {
    require(configs.nonEmpty, "need at least one (bands, rows) config")
    val t = df.select(idCol.as("id"),
        array_distinct(TextAnalysis.tokens(textCol)).as("ts"),
        TextAnalysis.tokens(textCol).getItem(0).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = t.select(col("f"), col("id").as("ia"), col("ts").as("ta"))
    val b = t.select(col("f"), col("id").as("ib"), col("ts").as("tb"))
    val hist = a.join(b, "f").filter(col("ia") < col("ib"))
      .select(size(array_intersect(col("ta"), col("tb"))).as("c"),
        size(col("ta")).as("na"), size(col("tb")).as("nb"))
      .select((col("c").cast("double") /
        (col("na") + col("nb") - col("c"))).as("j"))
      .select(least(floor(col("j") * 10), lit(9L)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = configs.map { case (bands, rpb) =>
      val ps = pTable(bands, rpb)
      val pcol = (0 until 10).foldLeft(lit(0.0): Column) { (acc, k) =>
        when(col("bin") === k, lit(ps(k))).otherwise(acc)
      }
      val term6 = round(col("n") * pcol * lit(1e6)).cast("long")
      hist.agg(
          sum(when(col("bin") >= 5, col("n")).otherwise(0L)).as("pairs_hi"),
          sum(when(col("bin") < 5, col("n")).otherwise(0L)).as("pairs_lo"),
          sum(when(col("bin") >= 5, term6).otherwise(0L)).as("tp6"),
          sum(when(col("bin") < 5, term6).otherwise(0L)).as("fp6"))
        .select(lit(bands.toLong).as("bands"),
          lit(rpb.toLong).as("rows_per_band"),
          col("pairs_hi"), col("pairs_lo"),
          round(col("tp6").cast("double") / 1e6, 4).as("exp_tp"),
          round(col("fp6").cast("double") / 1e6, 4).as("exp_fp"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("bands"), col("rows_per_band"))
  }

  /** The DuckDB oracle text for [[curve]] over the `documents` table —
    * generated HERE so the embedded probability literals are the same
    * 9-dp strings the Spark plan uses. */
  def oracleSql(configs: Seq[(Int, Int)]): String = {
    def pLit(p: Double): String =
      java.math.BigDecimal.valueOf(p)
        .setScale(9, java.math.RoundingMode.HALF_UP).toPlainString
    val arms = configs.map { case (bands, rpb) =>
      val ps = pTable(bands, rpb)
      val pcase = (0 until 10).map(k => s"WHEN ${k} THEN ${pLit(ps(k))}")
        .mkString("CASE bin ", " ", " ELSE 0.0 END")
      s"""SELECT CAST($bands AS BIGINT) AS bands, CAST($rpb AS BIGINT) AS rows_per_band,
         CAST(sum(CASE WHEN bin >= 5 THEN n ELSE 0 END) AS BIGINT) AS pairs_hi,
         CAST(sum(CASE WHEN bin < 5 THEN n ELSE 0 END) AS BIGINT) AS pairs_lo,
         round(CAST(sum(CASE WHEN bin >= 5 THEN CAST(round(n * ($pcase) * 1e6) AS BIGINT) ELSE 0 END) AS DOUBLE) / 1e6, 4) AS exp_tp,
         round(CAST(sum(CASE WHEN bin < 5 THEN CAST(round(n * ($pcase) * 1e6) AS BIGINT) ELSE 0 END) AS DOUBLE) / 1e6, 4) AS exp_fp
         FROM h"""
    }.mkString("\n UNION ALL\n")
    s"""WITH t AS (SELECT doc_id AS id,
           list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS ts,
           string_split_regex(lower(trim(text)), '\\s+')[1] AS f
         FROM documents),
       p AS (SELECT len(list_intersect(a.ts, b.ts)) AS c, len(a.ts) AS na, len(b.ts) AS nb
             FROM t a JOIN t b ON a.f = b.f AND a.id < b.id),
       j AS (SELECT CAST(c AS DOUBLE) / (na + nb - c) AS j FROM p),
       h AS (SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS bin, count(*) AS n
             FROM j GROUP BY 1)
       SELECT * FROM ($arms) ORDER BY bands, rows_per_band"""
  }
}
