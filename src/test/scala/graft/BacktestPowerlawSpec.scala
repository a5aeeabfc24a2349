package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.Trend
import graft.graph.RichClub

/** Forecast backtest and power-law degree MLE (q277–q278). */
class BacktestPowerlawSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("forecastBacktest: a perfectly linear series backtests to zero error") {
    import spark.implicits._
    val days = (0 until 20).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
        100.0 + 3.0 * i)
    }.toDF("ts", "value")
    val r = Trend.forecastBacktest(days, "ts", "value", 0.8).collect().head
    assert(r.getLong(0) == 16 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("forecastBacktest: a level shift after the cut shows up as forward error") {
    import spark.implicits._
    val days = (0 until 20).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 00:00:00"),
        if (i < 16) 100.0 else 200.0)
    }.toDF("ts", "value")
    val r = Trend.forecastBacktest(days, "ts", "value", 0.8).collect().head
    // flat train → forecast ≈ 100, actual 200 → MAE ≈ 100, MAPE ≈ 0.5
    assert(r.getDouble(2) > 90 && math.abs(r.getDouble(3) - 0.5) < 0.05)
  }

  test("powerLawAlpha: closed form on a hand degree multiset") {
    import spark.implicits._
    // star K1,4: hub degree 4, four leaves degree 1 → tail (d>=2) is
    // just the hub: alpha = 1 + 1/ln(4/1.5)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = RichClub.powerLawAlpha(e, "a", "b", 2L).collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 1)
    assert(math.abs(r.getDouble(2) - (1 + 1 / math.log(4 / 1.5))) < 1e-6)
    // a heavier tail (more low-degree mass) ⇒ larger alpha: triangle
    // chain degrees {2,2,2} vs the hub's 4
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val t = RichClub.powerLawAlpha(tri, "a", "b", 2L).collect().head
    assert(t.getDouble(2) > r.getDouble(2))
  }
}
