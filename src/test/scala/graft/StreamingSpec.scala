package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.mine.DrainConfig
import graft.sources.Tables
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("streaming windowed counts equal the batch plan on the same data") {
    import spark.implicits._
    val path = s"${TestSession.sf}/events.parquet"
    val schema = spark.read.parquet(path).schema
    val streamed = StreamingOps.runToMemory(spark, src =>
        StreamingOps.windowedCounts(
          src.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long"))),
          "ts", "event_type", "value", "1 hour"),
        TestSession.sf, "events.parquet", schema)
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = StreamingOps.windowedCounts(
        Tables.events(spark, TestSession.sf), "ts", "event_type", "value", "1 hour")
      .orderBy($"window_start", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup drops within-watermark duplicate keys across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = StreamingOps.dedupeStream(
        input.toDF().toDF("key", "ts", "payload"), "ts", Seq("key"), "30 minutes")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append")
      .start()
    input.addData((1L, ts(0), "a"), (1L, ts(1), "dup"), (2L, ts(2), "b"))
    q.processAllAvailable()
    input.addData((1L, ts(3), "dup2"), (3L, ts(4), "c"))
    q.processAllAvailable()
    q.stop()
    val keys = spark.table("dedup_test").select($"key").as[Long].collect().sorted
    assert(keys.toSeq == Seq(1L, 2L, 3L), s"got ${keys.toSeq}")
  }

  test("stateful streaming mining across micro-batches matches sequential mining") {
    assume(GoldenFixture.available)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lines = GoldenFixture.lines()
    val input = MemoryStream[(Int, String)]
    val q = StreamingOps.streamingMine(input.toDS(), DrainConfig())
      .toDF("shard", "t")
      .writeStream.format("memory").queryName("mine_test").outputMode("append")
      .start()
    // two micro-batches over one shard — state must carry across batches
    input.addData(lines.take(600).map(l => (0, l)))
    q.processAllAvailable()
    input.addData(lines.drop(600).map(l => (0, l)))
    q.processAllAvailable()
    q.stop()
    // last emitted snapshot per cluster id = final state
    val snap = spark.table("mine_test")
      .select($"t.eventId", $"t.size", $"t.template")
      .groupBy($"eventId")
      .agg(max(struct($"size", $"template")).as("s"))
      .select($"eventId", $"s.size", $"s.template")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val seq = DrainConfig().newTree()
    lines.foreach(seq.addLogMessage)
    val expect = seq.clusters.map(t => (t.eventId, t.size, t.template))
    assert(snap.map(_._1).toSeq == expect.map(_._1), "cluster id sets differ")
    assert(snap.map(_._2).sum == 1282L, "mass must be conserved")
    assert(snap.toSeq == expect, "final streamed state must equal sequential mining")
  }
}
