package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

import graft.analyze.{Experiment, Survival}
import graft.functions.Phi

/** RMST (q330), Bayesian A/B via the shared Φ (q331), sharp RDD
  * (q332), and the recurrent-event MCF (q333). */
class SurvivalCausalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("phi matches the normal CDF to the A&S error bound") {
    import spark.implicits._
    val xs = Seq(-3.0, -1.959963984540054, -1.0, 0.0, 0.5, 1.0,
      1.959963984540054, 3.0)
    val got = xs.toDF("x").select(Phi.phi(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    val want = Seq(0.0013499, 0.025, 0.1586553, 0.5, 0.6914625,
      0.8413447, 0.975, 0.9986501)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 2e-7, s"phi: $g vs $w") }
  }

  test("rmst integrates the KM step curve by hand") {
    import spark.implicits._
    // 4 users: deaths at day 2 (u1) and day 4 (u2); u3/u4 censored at
    // day 6. KM: S(2)=0.75, S(4)=0.5 → RMST(5) = 2·1 + 2·0.75 + 1·0.5 = 4
    val rows = Seq(
      (1L, "2024-01-01", "view"), (1L, "2024-01-03", "purchase"),
      (2L, "2024-01-01", "view"), (2L, "2024-01-05", "purchase"),
      (3L, "2024-01-01", "view"), (3L, "2024-01-07", "view"),
      (4L, "2024-01-01", "view"), (4L, "2024-01-07", "view"))
      .toDF("user_id", "d", "event_type")
      .withColumn("ts", col("d").cast("timestamp"))
    val r = Survival.rmst(rows, "user_id", "ts",
      col("event_type") === "purchase", 5).collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-6)
  }

  test("rmst with no deaths is tau") {
    import spark.implicits._
    val rows = Seq((1L, "2024-01-01", "view"), (1L, "2024-01-09", "view"))
      .toDF("user_id", "d", "event_type")
      .withColumn("ts", col("d").cast("timestamp"))
    val r = Survival.rmst(rows, "user_id", "ts",
      col("event_type") === "purchase", 5).collect().head
    assert(r.getLong(1) == 0 && math.abs(r.getDouble(2) - 5.0) < 1e-9)
  }

  test("bayes ab: symmetric arms give p near 0.5, lift near 0") {
    import spark.implicits._
    // users land in arms by hash; identical conversion patterns per user
    // id mean arms differ only by sampling — check structural outputs
    val rows = (1L to 200L).map(u => (u, if (u % 4 == 0) "signup"
      else "view")).toDF("user_id", "event_type")
    val r = Experiment.bayesAb(rows, "user_id",
      col("event_type") === "signup").collect().head
    assert(r.getLong(0) + r.getLong(1) == 200)
    val p = r.getDouble(7)
    assert(p > 0.0 && p < 1.0)
    assert(r.getDouble(5) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(6))
  }

  test("bayes ab posterior math on a fixed 2x2") {
    import spark.implicits._
    // force arms via known hash parity is opaque — instead verify the
    // posterior formula through the public output on a crafted frame
    // where one arm converts always and the other never: lift must be
    // strongly positive or negative and p_b_beats_a consistent with it
    val rows = (1L to 400L).map(u => (u,
      if (u % 2 == 0) "signup" else "view")).toDF("user_id", "event_type")
    val r = Experiment.bayesAb(rows, "user_id",
      col("event_type") === "signup").collect().head
    val lift = r.getDouble(4); val p = r.getDouble(7)
    assert((lift > 0 && p > 0.5) || (lift < 0 && p < 0.5) ||
      (lift == 0 && math.abs(p - 0.5) < 1e-9))
  }

  test("rdd recovers a crafted intercept jump") {
    import spark.implicits._
    // left of 50: outcome rate rises to 0.4 at the cutoff; right: jumps
    // to 0.8. Build symmetric grids so the local-linear intercepts are
    // exactly the boundary values.
    // 4 rows per distinct x with a FIXED positive count, so the rate is
    // exactly constant in x on each side: slope 0, intercept = rate
    val left = for (i <- 0 until 100) yield
      (50.0 - 25.0 * (i % 25 + 1) / 26.0, i / 25 < 2)   // 50% positive
    val right = for (i <- 0 until 100) yield
      (50.0 + 25.0 * (i % 25) / 26.0, i / 25 < 3)        // 75% positive
    val df = (left ++ right).toDF("v", "y")
    val r = Experiment.rdd(df, col("v"), col("y"), 50.0, 25.0)
      .collect().head
    assert(r.getLong(0) == 100 && r.getLong(1) == 100)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-6)
    assert(math.abs(r.getDouble(3) - 0.75) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-6)
  }

  test("mcf counts recurrent events against staggered risk sets") {
    import spark.implicits._
    // u1: purchases at day 1 and 3, follow-up 4; u2: purchase at day 1,
    // follow-up 2. Risk: day1 → 2 users, day3 → 1 user.
    // MCF(1) = 2/2 = 1; MCF(3) = 1 + 1/1 = 2.
    val rows = Seq(
      (1L, "2024-01-01", "view"), (1L, "2024-01-02", "purchase"),
      (1L, "2024-01-04", "purchase"), (1L, "2024-01-05", "view"),
      (2L, "2024-01-01", "view"), (2L, "2024-01-02", "purchase"),
      (2L, "2024-01-03", "view"))
      .toDF("user_id", "d", "event_type")
      .withColumn("ts", col("d").cast("timestamp"))
    val rs = Survival.mcf(rows, "user_id", "ts",
      col("event_type") === "purchase").collect()
    assert(rs.length == 2)
    val d1 = rs.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) == 2 && d1.getLong(2) == 2)
    assert(math.abs(d1.getDouble(3) - 1.0) < 1e-6)
    val d3 = rs.find(_.getLong(0) == 3L).get
    assert(d3.getLong(1) == 1 && d3.getLong(2) == 1)
    assert(math.abs(d3.getDouble(3) - 2.0) < 1e-6)
  }
}
