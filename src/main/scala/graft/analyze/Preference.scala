package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction (the DPO / RLHF reward-modeling data
  * step): from a scored candidate pool, emit one `(chosen, rejected)`
  * pair per group — the best- and worst-scored members — with the score
  * margin. Groups with fewer than two members produce no pair (there is
  * nothing to prefer between).
  *
  * Determinism contract: chosen = highest score, ties to the SMALLEST
  * id; rejected = lowest score, ties to the LARGEST id — so an
  * all-equal-scores group still yields a well-defined (and distinct)
  * pair, identically on any engine.
  *
  * Scale shape: ONE hash aggregate on the group key — both extremes ride
  * a single min/max-struct pair (the same bounded-state trade as
  * [[graft.operators.Cdc]]): no ranking window, no per-group sort, map-
  * side partial combine. The struct carries (score, id) only; payloads
  * re-join by id afterwards if the caller needs them.
  */
object Preference {

  /** `(groupCol, chosen_id, rejected_id, chosen_score, rejected_score,
    * margin)` per group with ≥ 2 members; margin rounded to 4 dp. */
  def pairs(df: DataFrame, groupCol: String, idCol: String,
            scoreCol: String): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric (a string id silently casts to null and every " +
        s"group then emits null chosen_id/rejected_id — same contract as " +
        s"Packing.packSequential); got ${df.schema(idCol).dataType.simpleString}")
    // one struct, two extremes: lexicographic (−score, id) makes
    //   min = (highest score, smallest id among them)
    //   max = (lowest score, largest id among them)
    val s = struct((-col(scoreCol)).as("ns"), col(idCol).cast("long").as("id"))
    df.groupBy(col(groupCol))
      .agg(min(s).as("__c"), max(s).as("__r"), count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col(groupCol),
        col("__c.id").as("chosen_id"), col("__r.id").as("rejected_id"),
        (-col("__c.ns")).as("chosen_score"), (-col("__r.ns")).as("rejected_score"),
        round(col("__r.ns") - col("__c.ns"), 4).as("margin"))
  }
}
