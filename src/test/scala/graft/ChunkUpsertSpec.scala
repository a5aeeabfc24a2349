package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.text.Chunker

/** Sliding token-window chunking and keyed snapshot upsert. */
class ChunkUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // -------------------------------------------------------------- chunker

  test("tokenWindows hand-computed windows with overlap") {
    // 11 tokens, size 4, overlap 1 -> step 3 -> full windows at 0,3,6 and
    // a short tail at 9 (t9 t10)
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Chunker.tokenWindows(df, "doc_id", "text", winSize = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk")
      .as[(Int, Int, String)].collect()
    assert(got.length == 4)
    assert(got(0) == ((0, 4, "t0 t1 t2 t3")))
    assert(got(1) == ((1, 4, "t3 t4 t5 t6")))
    assert(got(2) == ((2, 4, "t6 t7 t8 t9")))
    assert(got(3) == ((3, 2, "t9 t10")))
  }

  test("tokenWindows coverage: every token appears in some window") {
    val n = 57
    val df = Seq((1L, (0 until n).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunker.tokenWindows(df, "doc_id", "text", 8, 3)
      .select("chunk").as[String].collect()
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered == (0 until n).map(i => s"w$i").toSet)
    // adjacent windows share exactly `overlap` tokens (except the short tail)
    val arrs = chunks.map(_.split(" "))
    arrs.sliding(2).foreach { case Array(a, b) =>
      if (b.length == 8) assert(a.takeRight(3).sameElements(b.take(3)))
    }
  }

  test("short document yields exactly one window") {
    val df = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val got = Chunker.tokenWindows(df, "doc_id", "text", 32, 8).collect()
    assert(got.length == 1 && got.head.getAs[Int]("n_chunk_tokens") == 3)
  }

  // --------------------------------------------------------------- upsert

  test("upsert: update-wins per row, inserts appended, base passthrough") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 999.0), (9L, "new", 1.0)).toDF("k", "name", "v")
    val got = Upsert.upsert(base, updates, "k")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 999.0),
      (3L, "c", 30.0), (9L, "new", 1.0)))
  }

  test("upsert: an explicit null in the update row is an assignment") {
    val base = Seq((1L, "keep")).toDF("k", "name")
    val updates = Seq((1L, null: String)).toDF("k", "name")
    val got = Upsert.upsert(base, updates, "k").collect()
    assert(got.length == 1 && got.head.isNullAt(1))
  }

  test("upsert: a null-key update row carries its payload, never a garbage row") {
    val base = Seq((Some(1L), "a")).toDF("k", "name")
    val updates = Seq((None: Option[Long], "orphan")).toDF("k", "name")
    val got = Upsert.upsert(base, updates, "k")
      .orderBy(asc_nulls_first("k")).collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(0) && got(0).getString(1) == "orphan")
    assert(got(1).getLong(0) == 1L && got(1).getString(1) == "a")
  }

  test("upsert rejects mismatched schemas") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val updates = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Upsert.upsert(base, updates, "k")
    }
  }
}
