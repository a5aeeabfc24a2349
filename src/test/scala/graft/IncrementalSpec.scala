package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Temporal

/** Incremental dedup and per-key sequence assembly. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ------------------------------------------------------ incremental dedup

  test("incrementalExact drops corpus-known and batch-internal duplicates") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "beta alpha   gamma"),   // token-set dup of corpus doc 1 -> dropped
      (11L, "zeta eta"),             // novel, kept
      (12L, "eta zeta"),             // set-dup of 11 within the batch -> dropped
      (13L, "delta epsilon"),        // exact dup of corpus doc 2 -> dropped
      (14L, "theta")                 // novel, kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(fresh, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 14L))
  }

  test("incrementalExact with empty corpus degrades to plain batch dedup") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val fresh = Seq((1L, "a b"), (2L, "b a"), (3L, "c")).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(fresh, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  // ------------------------------------------------------ sequence assembly

  test("assembleSequences pins payload order by the sort columns") {
    val events = Seq(
      (7L, 3L, 30L, "c"),
      (7L, 1L, 10L, "a"),
      (7L, 2L, 20L, "b"),
      (8L, 1L, 5L, "x")
    ).toDF("user_id", "ord", "event_id", "event_type")
    val got = Temporal.assembleSequences(
        events, "user_id", Seq(col("ord"), col("event_id")), col("event_type"))
      .orderBy("user_id").as[(Long, Long, String)].collect()
    assert(got(0) == ((7L, 3L, "a,b,c")))
    assert(got(1) == ((8L, 1L, "x")))
  }

  test("assembleSequences is partitioning-invariant") {
    val base = (1 to 300).map(i => (i % 9L, i.toLong, s"t${i % 5}"))
    val one = Temporal.assembleSequences(
        base.toDF("k", "i", "p").repartition(1), "k", Seq(col("i")), col("p"))
      .orderBy("k").collect().toSeq
    val many = Temporal.assembleSequences(
        base.toDF("k", "i", "p").repartition(17), "k", Seq(col("i")), col("p"))
      .orderBy("k").collect().toSeq
    assert(one == many && one.size == 9)
  }
}
