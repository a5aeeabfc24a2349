package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.SchemaDiff
import graft.sources.Versioned

/** Schema drift detection, and its composition with Versioned snapshots. */
class SchemaDiffSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("diff reports added, dropped and type-changed columns") {
    import spark.implicits._
    val old = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val cur = Seq((1L, 2, true)).toDF("id", "score", "flag")
    val got = SchemaDiff.diff(old, cur)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("flag", "added"), ("name", "dropped"),
      ("score", "type_changed")))
    val sc = SchemaDiff.diff(old, cur).filter(col("column") === "score")
      .collect().head
    assert(sc.getString(2) == "DOUBLE" && sc.getString(3) == "INT")
  }

  test("identical schemas diff to empty") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    assert(SchemaDiff.diff(df, df).count() == 0)
  }

  test("composes with Versioned: drift between snapshot versions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sd").toString
    Versioned.commit(Seq((1L, "a")).toDF("id", "name"), root)
    Versioned.commit(Seq((2L, "b", 0.5)).toDF("id", "name", "score"), root,
      mode = "overwrite")
    val got = SchemaDiff.diff(
        Versioned.read(spark, root, Some(0)),
        Versioned.read(spark, root, Some(1)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("score", "added")))
  }
}
