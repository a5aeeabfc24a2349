package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric per-dimension int8 embedding quantization — the standard
  * 4× compression applied to an embedding store before ANN serving or
  * training-corpus export (the compressed form of the vectors that
  * [[Similarity.ivfTopK]] / SemDeDup consume at scale).
  *
  * Two passes, both shuffle-light:
  *  1. CALIBRATE: per-dimension max|x| → `scale = maxabs / 127`
  *     (posexplode fans rows × dims, but the aggregate partial-merges
  *     on `dims` keys — the shuffle carries dims part-maxima, not
  *     components);
  *  2. QUANTIZE: `q = round(x / scale)` clamped to [-127, 127] — a pure
  *     projection against the broadcast calibration row set.
  *
  * The REPORT form ([[quantError]]) returns per-dimension scale and
  * reconstruction error (mean |x − q·scale|, DECIMAL-exact mean) — the
  * quality gate a pipeline checks before switching serving to int8.
  * Every step is engine-portable arithmetic (max, IEEE division,
  * half-away-from-zero rounding on both engines), so it is SQL-oracle-able.
  */
object Quantize {

  /** Per-dimension calibration: `(dim, scale)` with
    * `scale = max(|x|) / 127` (0-based dim). All-zero dimensions get
    * scale 0 and quantize to 0. */
  def calibrate(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg((max(abs(col("x"))) / 127.0).as("scale"))

  /** Per-dimension quantization report: `(dim, scale, mae)` where `mae`
    * is the mean absolute reconstruction error over all vectors,
    * rounded to 6 dp. */
  def quantError(df: DataFrame, vecCol: String): DataFrame = {
    val comps = df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
    val cal = calibrate(df, vecCol)
    comps.join(cal, "dim")
      .withColumn("q",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(least(greatest(round(col("x") / col("scale"), 0), lit(-127.0)), lit(127.0))))
      .withColumn("err", abs(col("x") - col("q") * col("scale")))
      .groupBy(col("dim"))
      .agg(round(first(col("scale")), 6).as("scale"),
           round(sum(col("err").cast("decimal(30,12)")).cast("double") /
             count(lit(1)), 6).as("mae"))
  }

  /** The quantized vectors: `(id, qvec)` with `qvec: array<int>` in
    * [-127, 127] — the export form. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // dim-ordered scale vector: sort_array over (dim, scale) structs —
    // collect_list alone has no ordering guarantee across partials
    val scales = broadcast(calibrate(df, vecCol).agg(
      transform(sort_array(collect_list(struct(col("dim"), col("scale")))),
        s => s.getField("scale")).as("scales")))
    df.crossJoin(scales)
      .select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"), col("scales"),
          (x, s) => when(s === 0.0, lit(0))
            .otherwise(least(greatest(round(x / s, 0), lit(-127.0)), lit(127.0))
              .cast("int"))).as("qvec"))
  }
}
