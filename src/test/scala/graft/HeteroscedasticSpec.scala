package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Contingency, Trend, VarianceTests}

/** Welch ANOVA, Bartlett, Cochran-Armitage, spectral entropy
  * (q344–q347). */
class HeteroscedasticSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("welchAnova: equal-variance textbook case matches closed form") {
    import spark.implicits._
    // groups {1,2,3},{2,3,4},{6,7,8}: all v=1 → w_j = 3, W = 9,
    // weighted grand mean 4; num = 3·(4+1+9)/2 = 21;
    // Λ = 3·(1−1/3)²/2 = 2/3; corr = 1 + 2·1/8·(2/3) = 7/6 →
    // F* = 21/(7/6) = 18; df2 = (9−1)/(3·2/3) = 4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0),
      ("b", 4.0), ("c", 6.0), ("c", 7.0), ("c", 8.0)).toDF("g", "v")
    val r = VarianceTests.welchAnova(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
    assert(math.abs(r.getDouble(2) - 18.0) < 1e-4)
    assert(r.getLong(3) == 2)
    assert(math.abs(r.getDouble(4) - 4.0) < 1e-3)
    // zero-variance and singleton groups are excluded from k/n
    val mixed = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 5.0),
      ("c", 9.0)).toDF("g", "v")
    val m = VarianceTests.welchAnova(mixed, col("g"), col("v")).collect().head
    assert(m.getLong(0) == 1 && m.getLong(1) == 2)
    assert(m.isNullAt(4)) // Λ undefined with one usable class
  }

  test("bartlett: equal variances give T = 0, 100x spread gives the LR closed form") {
    import spark.implicits._
    val eq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val e = VarianceTests.bartlett(eq, col("g"), col("v")).collect().head
    assert(e.getLong(0) == 2 && e.getLong(1) == 6)
    assert(math.abs(e.getDouble(2)) < 1e-6)
    assert(e.getLong(3) == 1)
    // a: v=1, b: v=100 → sp2 = 202/4 = 50.5;
    // T0 = 4·ln 50.5 − 2·ln 100; C = 1 + (1 − 1/4)/3 = 1.25
    val un = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val expT = (4.0 * math.log(50.5) - 2.0 * math.log(100.0)) / 1.25
    val u = VarianceTests.bartlett(un, col("g"), col("v")).collect().head
    assert(math.abs(u.getDouble(2) - expT) < 1e-4)
  }

  test("cochranArmitage: perfect dose trend scores the closed-form z, flat rate scores 0") {
    import spark.implicits._
    // doses 0/1/2, n=10 each, successes 0/5/10:
    // T = 25, E = 15, Var = 15·15/(900·29)·(30·50−900) = 600·225/26100
    val rows = (0 until 30).map { i =>
      val t = i / 10; val y = i % 10 < (t * 5) // 0,5,10 successes
      (t.toDouble * 100.0, if (y) "purchase" else "view")
    }.toDF("value", "event_type")
    val r = Contingency.cochranArmitage(rows,
      least(floor(col("value") / 100), lit(4)),
      col("event_type") === "purchase").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 30 && r.getLong(2) == 15)
    val varT = 15.0 * 15.0 / (900.0 * 29.0) * (30.0 * 50.0 - 900.0)
    assert(math.abs(r.getDouble(3) - 10.0 / math.sqrt(varT)) < 1e-4)
    assert(r.getDouble(4) < 0.001)
    // same rate at both doses: T = E → z = 0, p = 1
    val flat = (0 until 20).map { i =>
      ((i / 10).toDouble * 100.0, if (i % 2 == 0) "purchase" else "view")
    }.toDF("value", "event_type")
    val f = Contingency.cochranArmitage(flat,
      least(floor(col("value") / 100), lit(4)),
      col("event_type") === "purchase").collect().head
    assert(f.getDouble(3) == 0.0 && math.abs(f.getDouble(4) - 1.0) < 1e-9)
  }

  test("spectralEntropy: pure 7-day tone is concentrated at period 7, noise is near white") {
    import spark.implicits._
    val tone = (0 until 28).map { i =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        100.0 + 50.0 * math.sin(2.0 * math.Pi * i / 7.0))
    }.toDF("g", "ts", "value")
    val t = Trend.spectralEntropy(tone, "g", "ts", "value", 14).collect().head
    assert(t.getLong(2) == 7L)
    assert(t.getDouble(1) < 0.55 && t.getDouble(3) > 0.5)
    // hash-scrambled values: spread spectrum, entropy near 1
    val rng = new scala.util.Random(42)
    val noise = (0 until 28).map { i =>
      ("n", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
        rng.nextDouble() * 100.0)
    }.toDF("g", "ts", "value")
    val n = Trend.spectralEntropy(noise, "g", "ts", "value", 14).collect().head
    assert(n.getDouble(1) > 0.8)
    // constant series: zero power everywhere → entropy 0
    val const = (0 until 10).map(i =>
      ("c", java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 00:00:00"), 5.0))
      .toDF("g", "ts", "value")
    assert(Trend.spectralEntropy(const, "g", "ts", "value", 14)
      .collect().head.getDouble(1) == 0.0)
  }
}
