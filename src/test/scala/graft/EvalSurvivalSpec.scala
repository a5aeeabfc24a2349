package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Survival
import graft.ml.Evaluation

/** Calibration/lift tables + log-rank test. */
class EvalSurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("perfectly calibrated 0/1 scores: zero Brier, rate equals score") {
    import spark.implicits._
    val df = ((1 to 30).map(i => (i.toLong, 1.0, true)) ++
      (31 to 100).map(i => (i.toLong, 0.0, false))).toDF("id", "s", "t")
    val rows = Evaluation.calibrationReport(df, col("s"), col("t")).collect()
    rows.foreach { r =>
      assert(r.getDouble(4) == 0.0) // global Brier
      assert(r.getDouble(2) == r.getDouble(3)) // mean score == obs rate
    }
  }

  test("lift table: a perfectly ranking score captures all response early") {
    import spark.implicits._
    // 100 rows, top 20 by score are the only responders
    val df = (1 to 100).map { i =>
      (i.toLong, (101 - i).toDouble / 100.0, i <= 20)
    }.toDF("id", "s", "t")
    val rows = Evaluation.liftTable(df, "id", col("s"), col("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5)))
    assert(rows(0)._2 == 5.0)     // decile 1 lift = 1.0/0.2
    assert(rows(1)._3 == 1.0)     // all responders captured by decile 2
    assert(rows(9)._2 == 0.0)
  }

  test("log-rank: identical arm behavior gives near-zero chi-square") {
    import spark.implicits._
    // every user converts on day 2 regardless of arm
    val ev = (1 to 120).flatMap { u =>
      Seq((u.toLong, ts("2024-01-01 00:00:00"), "view"),
        (u.toLong, ts("2024-01-03 00:00:00"), "purchase"))
    }.toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    // single death time, O1 == E1 exactly → chi2 null (V = 0) or 0
    assert(r.isNullAt(2) || r.getDouble(2) == 0.0)
  }

  test("log-rank: a much faster arm produces a large statistic") {
    import spark.implicits._
    // arm is the portable hash; make conversion speed depend on it
    val ev = (1 to 200).flatMap { u =>
      val arm0 = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(u.toString.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0
      }
      val convDay = if (arm0) "2024-01-02" else "2024-01-25"
      Seq((u.toLong, ts("2024-01-01 00:00:00"), "view"),
        (u.toLong, ts(s"$convDay 00:00:00"), "purchase"))
    }.toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    assert(r.getDouble(2) > 50.0, s"chi2 ${r.getDouble(2)}")
  }

  test("Cohen's kappa: perfect agreement 1, independent judgments ~0") {
    import spark.implicits._
    import graft.analyze.Contingency
    val agree = (1 to 100).map(i => (i.toLong, i % 2 == 0, i % 2 == 0))
      .toDF("id", "a", "b")
    assert(Contingency.cohensKappa(agree, col("a"), col("b"))
      .collect().head.getDouble(5) == 1.0)
    // b independent of a (period-4 vs period-2 phase shift)
    val indep = (1 to 400).map(i => (i.toLong, i % 2 == 0, (i / 2) % 2 == 0))
      .toDF("id", "a", "b")
    assert(math.abs(Contingency.cohensKappa(indep, col("a"), col("b"))
      .collect().head.getDouble(5)) < 0.05)
  }

  test("Cohen's d recovers a planted standardized shift") {
    import spark.implicits._
    import graft.analyze.Experiment
    // per-unit metric: arm A ~ base + 10, arm B ~ base; common spread 4
    val ev = (1 to 400).map { u =>
      val arm0 = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(u.toString.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0
      }
      val base = (u % 9).toDouble // spread
      (u.toLong, "purchase", base + (if (arm0) 10.0 else 0.0))
    }.toDF("user_id", "event_type", "value")
    val d = Experiment.cohensD(ev, "user_id", "value",
      col("event_type") === "purchase").collect().head.getDouble(2)
    assert(d > 2.0, s"d $d should be large for a 10-unit shift on ~2.6 sd")
  }
}
