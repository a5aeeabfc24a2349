package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overflow a single reducer.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting
  * is the PLAN-level tool for the cases AQE can't fix (broadcast-disabled
  * environments, aggregations on skewed keys, deterministic layout needs):
  * the fact side's key is diversified with a deterministic salt in
  * [0, nSalts), and the dimension side is replicated once per salt value,
  * so a key that used to land on one reducer now spreads over `nSalts`.
  *
  * The salt is `pmod(hash(factKey, monotonic row id), nSalts)` — spread is
  * uniform per ROW, not per key, and requires no data statistics.
  */
object Skew {

  /** Equi-join `fact.factKey === dim.dimKey` with the dim side replicated
    * `nSalts` times. Result columns = fact columns ++ dim columns.
    *
    * Every join column is resolved against its OWN side
    * (`salted(factKey) === replicated(dimKey)`): a bare `col(factKey)`
    * would be ambiguous whenever both sides name the key identically —
    * the common case for a natural key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(factKey), monotonically_increasing_id()), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
        salted(factKey) === replicated(dimKey))
      .drop("__salt")
  }
}
