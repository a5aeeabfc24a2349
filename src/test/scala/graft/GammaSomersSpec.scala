package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.RankStats

/** Goodman-Kruskal gamma + Somers' D (q282). */
class GammaSomersSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("perfect monotone volume-value days give gamma = somers = 1") {
    import spark.implicits._
    // day i has i events of value i → x and y strictly co-ordered
    val rows = for (i <- 1 to 6; _ <- 1 to i) yield (day(i), i.toDouble)
    val r = RankStats.gammaSomers(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getLong(0) == 6 && r.getLong(2) == 0)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("dependent-side ties drag Somers' D below gamma") {
    import spark.implicits._
    // days 1..4: volumes 1,2,3,4; per-event values 5,5,7,7 — y ties on
    // (1,2) and (3,4): C = 4, D = 0, Ty = 2 → gamma 1, D_yx = 4/6
    val rows =
      (for (_ <- 1 to 1) yield (day(1), 5.0)) ++
      (for (_ <- 1 to 2) yield (day(2), 5.0)) ++
      (for (_ <- 1 to 3) yield (day(3), 7.0)) ++
      (for (_ <- 1 to 4) yield (day(4), 7.0))
    val r = RankStats.gammaSomers(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getLong(1) == 4 && r.getLong(2) == 0 && r.getLong(4) == 2)
    assert(r.getDouble(5) == 1.0)
    assert(math.abs(r.getDouble(6) - 4.0 / 6) < 1e-6)
  }

  test("anti-monotone days give gamma = -1") {
    import spark.implicits._
    val rows = for (i <- 1 to 5; _ <- 1 to i) yield (day(i), (10 - i).toDouble)
    val r = RankStats.gammaSomers(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getDouble(5) == -1.0)
  }
}
