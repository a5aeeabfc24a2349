package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.operators.IntervalJoin
import graft.sources.Versioned

/** Versioned snapshot table: commit protocol, time travel, consistency;
  * plus the auto-bucket interval join and TextRank composition. */
class VersionedSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-versioned").toString

  test("commits create consecutive versions; time travel reads each") {
    import spark.implicits._
    val root = tmpRoot()
    val v0 = Versioned.commit(Seq(1, 2, 3).toDF("x"), root)
    val v1 = Versioned.commit(Seq(4, 5).toDF("x"), root) // append
    val v2 = Versioned.commit(Seq(9).toDF("x"), root, mode = "overwrite")
    assert(Seq(v0, v1, v2) == Seq(0, 1, 2))
    assert(Versioned.read(spark, root, Some(0)).count() == 3)
    assert(Versioned.read(spark, root, Some(1)).count() == 5)
    assert(Versioned.read(spark, root, Some(2)).count() == 1)
    // latest = v2; v1 still readable after the overwrite (time travel)
    assert(Versioned.read(spark, root).count() == 1)
    assert(Versioned.read(spark, root, Some(1)).as[Int].collect().sorted
      .toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("readers never see unmanifested data (interrupted-writer orphans)") {
    import spark.implicits._
    val root = tmpRoot()
    Versioned.commit(Seq(1, 2).toDF("x"), root)
    // simulate a writer that died after writing data, before the manifest
    Seq(100, 200, 300).toDF("x").write
      .parquet(s"$root/data/orphan-${java.util.UUID.randomUUID()}")
    assert(Versioned.read(spark, root).count() == 2)
    // the next commit is also unaffected
    Versioned.commit(Seq(3).toDF("x"), root)
    assert(Versioned.read(spark, root).count() == 3)
  }

  test("versions() is empty on a fresh root; read refuses it") {
    val root = tmpRoot()
    assert(Versioned.versions(root).isEmpty)
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root)
    }
  }

  test("streaming micro-batches commit one snapshot version each") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-streamsrc").toString
    // two FLAT source files → two micro-batches at maxFilesPerTrigger=1
    // (df.write.parquet(path) makes a directory; the file source wants
    // plain files, so lift the single part file out)
    def writeFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-flat").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(srcDir, name))
    }
    writeFlat(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "f1.parquet")
    writeFlat(Seq((3L, "c")).toDF("id", "s"), "f2.parquet")
    val schema = spark.read.parquet(s"$srcDir/f1.parquet").schema
    val root = tmpRoot()
    val nVersions = graft.streaming.StreamingOps.streamToVersioned(
      spark, srcDir, "*.parquet", schema, root)
    assert(nVersions == 2)
    // latest version holds the full backlog (append mode accumulates)
    assert(Versioned.read(spark, root).count() == 3)
    // the first version is a strict prefix — time travel over ingestion
    val v0 = Versioned.read(spark, root, Some(0)).count()
    assert(v0 == 1 || v0 == 2) // file pickup order is not contractual
  }

  test("overlapJoinAuto matches the fixed-bucket result") {
    import spark.implicits._
    val a = (0 until 40).map { i =>
      val s = (i * 733) % 3000L; (i.toLong, s, s + 50 + (i % 7) * 10L)
    }.toDF("a_id", "a_start", "a_end")
    val b = (0 until 40).map { i =>
      val s = (i * 911) % 3000L; (i.toLong, s, s + 40 + (i % 5) * 10L)
    }.toDF("b_id", "b_start", "b_end")
    val auto = IntervalJoin.overlapJoinAuto(a, b, "a_start", "a_end",
        "b_start", "b_end")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = IntervalJoin.overlapJoin(a, b, "a_start", "a_end",
        "b_start", "b_end", 97L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed)
  }

  test("TextRank ranks the hub word of a star-shaped corpus first") {
    import spark.implicits._
    // "hub" is adjacent to every other word; spokes only touch hub
    val docs = (0 until 8).map(i => (i.toLong, s"w$i hub w$i hub w$i"))
      .toDF("doc_id", "text")
    val got = SparkEntry.queries("q174_textrank")(spark, TestSession.sf)
    // run the same composition logic directly on the hand corpus instead:
    val tok = docs.select(col("doc_id"),
      posexplode(graft.text.TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = tok.withColumn("prev", lag(col("token"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("token"))
    val vocab = tok.select(col("token")).distinct()
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("token"))).cast("long"))
    val edges = pairs
      .join(vocab.select(col("token").as("prev"), col("id").as("src")), "prev")
      .join(vocab.select(col("token"), col("id").as("dst")), "token")
      .select(col("src"), col("dst"))
    val top = graft.graph.PageRank.run(edges, "src", "dst", iters = 10)
      .join(vocab.withColumnRenamed("id", "node"), "node")
      .orderBy(desc("rank")).select("token").collect().head.getString(0)
    assert(top == "hub")
    assert(got.columns.toSeq == Seq("token", "rank_x1000"))
  }
}
