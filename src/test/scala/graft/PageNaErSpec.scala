package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{RankStats, Survival}

/** ER clusters (q295), Page's trend test (q296), Nelson-Aalen (q297). */
class PageNaErSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("page trend on perfectly ordered treatments hits the maximum L") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // counts rise with treatment name in every block → per-block ranks
    // (1,2,3) in j order: L = 1·3 + 2·6 + 3·9 = 42, E = 36, V = 6
    val rows = for {
      b <- Seq("b1", "b2", "b3")
      (t, c) <- Seq("t1" -> 1, "t2" -> 2, "t3" -> 3)
      _ <- 1 to c
    } yield (b, t)
    val r = RankStats.pageTrend(rows.toDF("b", "t"), col("b"), col("t"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 42.0)
    assert(math.abs(r.getDouble(3) - 6.0 / math.sqrt(6.0)) < 1e-4)
  }

  test("page trend on anti-ordered treatments is the mirror image") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = for {
      b <- Seq("b1", "b2", "b3")
      (t, c) <- Seq("t1" -> 3, "t2" -> 2, "t3" -> 1)
      _ <- 1 to c
    } yield (b, t)
    val r = RankStats.pageTrend(rows.toDF("b", "t"), col("b"), col("t"))
      .collect().head
    assert(r.getDouble(2) == 30.0) // 1·9 + 2·6 + 3·3
    assert(math.abs(r.getDouble(3) + 6.0 / math.sqrt(6.0)) < 1e-4)
  }

  test("nelson-aalen hand life table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // u1 dies at dur 1, u2 at dur 2, u3 censored at dur 3:
    // t=1: n_risk 3, h 1/3; t=2: n_risk 2, h 1/2 → H = 1/3, 5/6
    val rows = Seq(
      (day(1), 1L, "signup"), (day(2), 1L, "purchase"),
      (day(1), 2L, "signup"), (day(3), 2L, "purchase"),
      (day(1), 3L, "signup"), (day(4), 3L, "view"))
      .toDF("ts", "user_id", "event_type")
    val r = Survival.nelsonAalen(rows, "user_id", "ts",
      col("event_type") === "purchase")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.length == 2)
    assert(r(0)._1 == 1 && r(0)._2 == 1 && r(0)._3 == 3)
    assert(math.abs(r(0)._4 - 0.333333) < 1e-9)
    assert(r(1)._1 == 2 && r(1)._3 == 2)
    assert(math.abs(r(1)._4 - 0.833333) < 1e-9)
    assert(math.abs(r(1)._5 - math.exp(-0.833333333)) < 1e-4)
  }

  test("nelson-aalen hazard never exceeds KM's -log(surv) direction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // standard inequality: NA survival >= KM survival at every time
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val na = Survival.nelsonAalen(ev, "user_id", "ts",
      col("event_type") === "purchase")
      .collect().map(x => (x.getLong(0), x.getDouble(4))).toMap
    val km = Survival.kaplanMeier(ev, "user_id", "ts",
      col("event_type") === "purchase")
      .collect().map(x => (x.getLong(0), x.getDouble(3))).toMap
    assert(na.keySet == km.keySet && na.nonEmpty)
    na.foreach { case (t, s) => assert(s >= km(t) - 1e-9) }
  }

  test("er clusters partition the linked records on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val r = SparkEntry.queries("q295_er_clusters")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(1) >= 2) // a cluster needs at least one link
      assert(x.getLong(1) == x.getLong(2) + x.getLong(3))
    }
    // clusters are disjoint: total members == distinct linked records
    val total = r.map(_.getLong(1)).sum
    val dedup = r.map(_.getLong(0)).distinct.length
    assert(dedup == r.length && total >= 2L * r.length)
  }
}
