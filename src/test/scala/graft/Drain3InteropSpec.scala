package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mine.Drain3State

/** Interop golden: reading the reference's OWN persisted Drain3 state
  * (`/root/reference/drain3_state.bin` — base64+zlib jsonpickle,
  * `process_logs_v10.py:39`) must reproduce the 1,140-cluster
  * steady-state `(Cluster ID, Size, Template)` rows of the matching
  * committed artifact `event_matrix_exec202411230733PM.csv` exactly,
  * and the restored tree must keep mining (the migration-resume path). */
class Drain3InteropSpec extends AnyFunSuite {
  val statePath = "/root/reference/drain3_state.bin"
  val csvPath = "/root/reference/event_matrix_exec202411230733PM.csv"

  def available: Boolean =
    new java.io.File(statePath).isFile && new java.io.File(csvPath).isFile

  /** Parse `Cluster ID,Size,Template` rows (template CSV-quoted when it
    * contains commas/quotes). */
  def goldenRows(): Seq[(Long, Long, String)] = {
    val src = scala.io.Source.fromFile(csvPath, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val pat = """^(\d+),(\d+),(.*)$""".r
    lines.drop(1).filter(_.nonEmpty).map {
      case pat(id, size, tpl) =>
        val t =
          if (tpl.startsWith("\"") && tpl.endsWith("\""))
            tpl.substring(1, tpl.length - 1).replace("\"\"", "\"")
          else tpl
        (id.toLong, size.toLong, t.trim)
      case other => sys.error(s"unparseable golden row: $other")
    }
  }

  test("state file parses with the reference's library config") {
    assume(available)
    val s = Drain3State.read(statePath)
    assert(s.depth == 4 && s.simTh == 0.4 && s.maxChildren == 100 &&
      s.maxClusters == 0 && s.paramStr == "<*>" && s.parametrizeNumericTokens)
    assert(s.clustersCounter == 1140L)
    assert(s.clusters.size == 1140)
  }

  test("restored snapshot reproduces the steady-state CSV bit-for-bit") {
    assume(available)
    val s = Drain3State.read(statePath)
    val got = s.clusters.map(t => (t.eventId, t.size, t.template))
    val golden = goldenRows()
    assert(got.size == golden.size)
    got.zip(golden).foreach { case (g, exp) =>
      assert(g == exp, s"row mismatch:\n got   : $g\n golden: $exp")
    }
    // and the round-trip through a live tree preserves the dump
    val tree = s.newTree()
    val dumped = tree.clusters.map(t => (t.eventId, t.size, t.template))
    assert(dumped == golden)
  }

  test("streaming mine resumes from the reference's drain3 state: steady-state stream") {
    assume(available && new java.io.File(GoldenFixture.logsPath).isFile)
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = statePath
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, String)](spark)
    // executor-side factory: every shard starts from the reference's
    // own persisted state (the migration-resume deployment shape)
    val q = graft.streaming.StreamingOps
      .streamingMineFrom(input.toDS(), () => Drain3State.read(path).newTree())
      .toDF("shard", "t")
      .writeStream.format("memory").queryName("drain3_resume")
      .outputMode("append").start()
    val lines = GoldenFixture.lines()
    input.addData(lines.take(700).map(l => (0, l)))
    q.processAllAvailable()
    // steady-state replay emits NOTHING (no structural change) — itself
    // the resume evidence; a novel sentinel line then forces exactly one
    // new cluster and a full snapshot emission to inspect
    val afterReplay = spark.table("drain3_resume").count()
    input.addData(lines.drop(700).map(l => (0, l)) :+
      ((0, "graft resume sentinel xyzzy plugh")))
    q.processAllAvailable()
    q.stop()
    assert(afterReplay == 0L,
      s"steady-state replay must not emit structural changes, got $afterReplay rows")
    val snap = spark.table("drain3_resume")
      .groupBy($"t.eventId".as("id"))
      .agg(max($"t.size").as("size"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the sentinel is cluster 1141; every reference cluster grew by its
    // replay share — total mass = golden + 1282 lines + 1 sentinel
    assert(snap.keys.max == 1141L, s"sentinel cluster id: ${snap.keys.max}")
    assert(snap.size == 1141)
    val base = goldenRows().map(r => r._1 -> r._2).toMap
    val grown = snap.map { case (id, sz) => sz - base.getOrElse(id, 0L) }
    assert(grown.sum == 1283L, s"streamed mass ${grown.sum} != 1283")
  }

  test("restored tree keeps mining: the 1,282-line sample replays into existing clusters") {
    assume(available && new java.io.File(GoldenFixture.logsPath).isFile)
    val s = Drain3State.read(statePath)
    val tree = s.newTree()
    val before = tree.clusterCount
    val beforeSize = tree.totalSize
    val created = GoldenFixture.lines()
      .count(l => tree.addLogMessage(l)._2 == "cluster_created")
    assert(created == 0,
      s"steady-state replay must not create clusters, created=$created")
    assert(tree.clusterCount == before)
    assert(tree.totalSize == beforeSize + 1282L)
  }
}
