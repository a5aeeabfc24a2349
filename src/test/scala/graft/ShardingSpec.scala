package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sharding

/** Shard export: portability of the hash contract (known md5 vector),
  * determinism across runs, statistical evenness under skewed keys, and
  * manifest mass conservation. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("shard id matches the portable md5 contract (known vector)") {
    import spark.implicits._
    // md5("hello") = 5d41402a... → 0x5d41402a = 1564557354 → % 16 = 10
    val got = Seq("hello").toDF("k")
      .select(Sharding.shardId($"k", 16).as("s")).head().getLong(0)
    assert(got == 10L)
  }

  test("assignment is deterministic and complete") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("doc_id")
    val a = Sharding.withShard(df, "doc_id", 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.withShard(df.repartition(13), "doc_id", 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < 16))
  }

  test("skewed sequential keys still spread evenly across shards") {
    import spark.implicits._
    // sequential ids are the adversarial case for naive mod-sharding
    val counts = Sharding.withShard((1L to 16000L).toDF("doc_id"), "doc_id", 16)
      .groupBy($"shard").count().collect().map(_.getLong(1))
    assert(counts.length == 16)
    val (lo, hi) = (counts.min, counts.max)
    assert(lo > 800 && hi < 1200, s"uneven shards: min $lo max $hi (expect ~1000)")
  }

  test("manifest conserves doc and byte mass") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, "x" * (i % 40 + 1).toInt)).toDF("doc_id", "text")
    val m = Sharding.manifest(docs, "doc_id", "text", 8).collect()
    assert(m.map(_.getLong(1)).sum == 300L)
    assert(m.map(_.getLong(2)).sum == (1L to 300L).map(i => i % 40 + 1).sum)
  }
}
