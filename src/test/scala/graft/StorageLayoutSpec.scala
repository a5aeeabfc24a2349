package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Storage-layout features: hive-partitioned writes with partition
  * PRUNING at the scan, schema-evolution merged reads, small-file
  * compaction. */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  test("partitioned write prunes partitions at planning time") {
    val dir = tmp()
    val df = Seq(
      (1L, "web", "a"), (2L, "web", "b"),
      (3L, "books", "c"), (4L, "code", "d")
    ).toDF("id", "source", "payload")
    Sinks.writePartitioned(df, dir, "source")
    // layout: one directory per source value
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs == Set("source=web", "source=books", "source=code"))
    val q = spark.read.parquet(dir).filter(col("source") === "web")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"partition filter must reach the scan:\n$plan")
    assert(q.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // pruning is physical: only the web directory's files are read
    val files = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n").filter(_.contains("Location"))).mkString
    assert(!files.contains("source=books"), s"pruned partition still listed: $files")
  }

  test("mergeSchema read presents the union of evolved schemas") {
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, 9.5)).toDF("id", "v2").write.parquet(s"$dir/p=2")
    val merged = Sinks.readParquet(spark, dir, mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "p"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("v1") == "a" && rows(0).isNullAt(merged.columns.indexOf("v2")))
    assert(rows(1).getAs[Double]("v2") == 9.5 && rows(1).isNullAt(merged.columns.indexOf("v1")))
  }

  test("compact rewrites many small files into few, losslessly") {
    val in = tmp(); val out = tmp()
    val df = (1 to 5000).map(i => (i.toLong, s"payload_$i")).toDF("id", "s")
    df.repartition(64).write.mode("overwrite").parquet(in)
    val before = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    Sinks.compact(spark, in, out, targetBytes = 512L * 1024)
    val after = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before, s"expected fewer files, got $after vs $before")
    // lossless
    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
