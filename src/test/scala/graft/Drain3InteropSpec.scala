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
