package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.Privacy
import graft.dedup.Linkage

/** T-closeness (q285) and Fellegi-Sunter weights (q286). */
class PrivacyLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("t-closeness hand case: both classes at t = 0.25") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // class A = {x,x}, class B = {x,y}; global x:3 y:1 over N = 4 →
    // t_A = ½(|1−¾| + |0−¼|) = ¼, t_B = ½(|½−¾| + |½−¼|) = ¼
    val rows = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"))
    val r = Privacy.tClosenessReport(rows.toDF("q", "s"), Seq(col("q")),
      col("s"), 0.2).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-9)
    assert(r.getLong(3) == 2 && r.getLong(4) == 4)
  }

  test("t-closeness: a class mirroring the global distribution scores 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // both classes 1x + 1y = the global mix → t = 0 everywhere
    val rows = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
    val r = Privacy.tClosenessReport(rows.toDF("q", "s"), Seq(col("q")),
      col("s"), 0.2).collect().head
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 0 && r.getLong(4) == 0)
  }

  test("fellegi-sunter weights match the closed form; nulls excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // f values a,a,b,c (+1 null dropped): u = 2/(4·3) = 1/6;
    // w_agree = log2(0.95·6), w_disagree = log2(0.05/(5/6))
    val rows = Seq(Some("a"), Some("a"), Some("b"), Some("c"), None)
      .map(v => Tuple1(v.orNull))
    val r = Linkage.fsWeights(rows.toDF("f"), Seq("f" -> col("f")))
      .collect().head
    assert(r.getString(0) == "f" && r.getLong(1) == 4 && r.getLong(2) == 3)
    val u = 1.0 / 6
    assert(math.abs(r.getDouble(3) - u) < 1e-7)
    assert(math.abs(r.getDouble(4) -
      math.round(math.log(0.95 / u) / math.log(2.0) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(r.getDouble(5) -
      math.round(math.log(0.05 / (1 - u)) / math.log(2.0) * 1e4) / 1e4) < 1e-9)
  }

  test("fellegi-sunter: a unique field has u = 0 and null agreement weight") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq("a", "b", "c").map(Tuple1(_))
    val r = Linkage.fsWeights(rows.toDF("f"), Seq("f" -> col("f")))
      .collect().head
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("dp quantile: uniform gaps land near the true median; constant data releases the constant") {
    import spark.implicits._
    val ev = (1 to 1000).map(u => (u.toLong, u.toDouble)).toDF("user_id", "value")
    val r = Privacy.dpQuantile(ev, org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("value"), 0.5, 0.5, "spec").collect().head
    assert(r.getLong(0) == 1000)
    val v = r.getDouble(3)
    // eps/2 = 0.25 per rank of utility vs Gumbel noise ~ +-10: the
    // winner must sit well inside the middle fifth
    assert(v > 400 && v < 600, s"dp median $v far from 500.5")
    // determinism under the same tag
    val r2 = Privacy.dpQuantile(ev, org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("value"), 0.5, 0.5, "spec").collect().head
    assert(r2.getDouble(3) == v)
    val const = (1 to 50).map(u => (u.toLong, 7.5)).toDF("user_id", "value")
    val rc = Privacy.dpQuantile(const, org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("value"), 0.5, 0.5, "spec").collect().head
    assert(rc.getDouble(3) == 7.5 && rc.getLong(0) == 50)
  }
}
