package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{Experiment, Smoothing}

/** Wilson/Newcombe intervals (q309) and EB rate shrinkage (q310). */
class WilsonEbSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("wilson intervals bracket the rates; newcombe brackets the diff") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // real hash arms over 200 users, conversion = signup event
    val rows = (1L to 200L).flatMap { u =>
      val conv = u % 3 == 0
      Seq((day(1), u, "view")) ++
        (if (conv) Seq((day(2), u, "signup")) else Nil)
    }
    val r = Experiment.wilsonAbReport(rows.toDF("ts", "user_id", "event_type"),
      "user_id", col("event_type") === "signup").collect().head
    val (na, ca) = (r.getLong(0), r.getLong(1))
    val (loA, hiA) = (r.getDouble(2), r.getDouble(3))
    val pa = ca.toDouble / na
    assert(loA > 0 && hiA < 1 && loA < pa && pa < hiA)
    val diff = r.getDouble(8)
    assert(r.getDouble(9) < diff && diff < r.getDouble(10))
    // closed-form check of the A bound
    val z = 1.96
    val denom = 1.0 + z * z / na
    val center = (pa + z * z / (2.0 * na)) / denom
    val half = z * math.sqrt(pa * (1 - pa) / na + z * z / (4.0 * na * na)) / denom
    assert(math.abs(loA - (center - half)) < 1e-6)
  }

  test("eb shrinkage ranks a 90/100 above a 1/1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a tight cluster of 30/100 users makes the moment-matched prior
    // strong: the 1/1 (raw 1.0) must shrink BELOW the 90/100 (raw 0.9)
    val rows =
      Seq((1L, true)) ++
      (1 to 100).map(i => (2L, i <= 90)) ++
      (for (u <- 3L to 18L; i <- 1 to 100) yield (u, i <= 30))
    val df = rows.zipWithIndex.map { case ((u, s), i) =>
      (day(1 + i % 28), u, if (s) "purchase" else "view")
    }.toDF("ts", "user_id", "event_type")
    val r = Smoothing.ebShrinkRates(df, col("user_id"),
      col("event_type") === "purchase")
      .collect().map(x => x.getLong(0) -> (x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L)._1 == 1.0 && r(1L)._2 < 0.6)       // 1/1 pulled hard
    assert(math.abs(r(2L)._2 - 0.9) < 0.05)         // 90/100 barely moves
    assert(r(1L)._2 < r(2L)._2)                      // ranking flips
  }

  test("eb shrinkage degenerate corpus (zero rate variance) falls back to raw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((day(1), 1L, "purchase"), (day(1), 2L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val r = Smoothing.ebShrinkRates(df, col("user_id"),
      col("event_type") === "purchase").collect()
    assert(r.forall(x => x.getDouble(4) == x.getDouble(3)))
  }

  test("smd balance: a planted covariate shift is flagged, a balanced one is not") {
    import spark.implicits._
    // discover arms, then give arm-1 users 3x the events
    val ids = (1L to 60L).toDF("id")
      .select(org.apache.spark.sql.functions.col("id"),
        (graft.operators.Sharding.hash32(
          org.apache.spark.sql.functions.col("id")) % 2 === 0).as("e"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val rows = ids.flatMap { case (u, exposed) =>
      val k = (if (exposed) 9 else 3) + (u % 3).toInt
      (1 to k).map(i => (day(1 + i % 5), u, 10.0 + (u % 2)))
    }
    val r = graft.analyze.Experiment.covariateBalance(
      rows.toSeq.toDF("ts", "user_id", "value"), "user_id", "ts", "value")
      .collect().map(x => x.getString(0) -> (x.getDouble(5), x.getLong(6))).toMap
    assert(r("n_events")._2 == 1 && r("n_events")._1 > 1.0)
    assert(r("value6")._2 == 1)  // value scales with events here
  }
}
