package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Privacy, TemporalSplit}
import graft.ml.Encoding

/** Target encoding, k-anonymity, temporal split. */
class EncodingPrivacySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("LOO target encoding excludes the row's own label") {
    import spark.implicits._
    // category 'a': targets 1,1,0 — LOO for the 0-row sees mean of {1,1}
    val df = Seq(("a", 1L, 1), ("a", 2L, 1), ("a", 3L, 0),
      ("b", 4L, 0)).toDF("c", "id", "t")
    val got = Encoding.targetEncodeLoo(df, "c", col("t") === 1, smoothing = 0.0001)
      .orderBy("id").select("target_enc").collect().map(_.getDouble(0))
    // with negligible smoothing: row1 ≈ (2-1)/2 = 0.5, row3 ≈ 2/2 = 1.0
    assert(math.abs(got(0) - 0.5) < 0.01)
    assert(math.abs(got(2) - 1.0) < 0.01)
  }

  test("target encoding with smoothing matches the closed form") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1), ("a", 2L, 0), ("b", 3L, 1)).toDF("c", "id", "t")
    val prior = 2.0 / 3.0
    val got = Encoding.targetEncodeLoo(df, "c", col("t") === 1, smoothing = 10.0)
      .orderBy("id").select("target_enc").collect().map(_.getDouble(0))
    val exp0 = (1.0 - 1.0 + 10.0 * prior) / (2.0 - 1.0 + 10.0)
    assert(math.abs(got(0) - math.rint(exp0 * 1e6) / 1e6) < 1e-9)
  }

  test("k-anonymity report finds the smallest equivalence class") {
    import spark.implicits._
    val df = Seq(("x", 1), ("x", 1), ("x", 1), ("y", 2), ("y", 2), ("z", 3))
      .toDF("q1", "q2")
    val r = Privacy.kAnonymityReport(df, Seq(col("q1"), col("q2")), 3L)
      .collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 3)
    assert(r.getLong(2) == 1)        // class ("z",3) has size 1
    assert(r.getLong(3) == 2)        // classes y and z below k=3
    assert(r.getLong(4) == 3)        // 2 + 1 rows at risk
  }

  test("temporal split: boundary is the rank cut; leakage check holds") {
    import spark.implicits._
    val df = (1 to 10).map(i =>
      (ts(f"2024-01-${i}%02d 00:00:00"), i.toLong)).toDF("ts", "id")
    val audit = TemporalSplit.auditReport(df, "ts", "id", 0.8).collect().head
    assert(audit.getLong(0) == 8 && audit.getLong(1) == 2)
    assert(audit.getTimestamp(2) == ts("2024-01-08 00:00:00"))
    assert(audit.getTimestamp(3) == ts("2024-01-09 00:00:00"))
    assert(audit.getBoolean(4))
    val split = TemporalSplit.byTime(df, "ts", "id", 0.8)
    assert(split.filter(col("split") === "train").count() == 8)
  }
}
