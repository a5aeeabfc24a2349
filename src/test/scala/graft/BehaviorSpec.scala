package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analyze.{Funnel, Scd2}
import graft.text.{Blocklist, Cooccurrence}

/** Round-6 additions: event funnel, cohort retention, SCD2 history,
  * PMI collocations, phrase-blocklist filtering. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ----------------------------------------------------------- funnel

  test("funnel requires each step strictly after the previous one") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // u2 clicked BEFORE viewing: click must not count (and the later
      // re-click does, so u2 reaches step 2 but never purchases)
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 09:30:00")),
      (2L, "click", ts("2024-01-01 09:45:00")),
      // u3: click at the SAME instant as view — strict > excludes it
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "click", ts("2024-01-01 08:00:00")),
      // u4 views only
      (4L, "view", ts("2024-01-01 07:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val rows = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy($"step_idx").collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("view", 4L), ("click", 2L), ("purchase", 1L)))
    assert(rows(0).isNullAt(3))
    assert(rows(1).getDouble(3) === 0.5)   // 2/4
    assert(rows(2).getDouble(3) === 0.5)   // 1/2
  }

  test("weeklyRetention buckets by first-event week and counts distinct active users") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1 cohort week 0
      (1L, ts("2024-01-02 10:00:00")), // same week — distinct'd
      (1L, ts("2024-01-09 10:00:00")), // week 1 → offset 1
      (2L, ts("2024-01-03 10:00:00")), // u2 cohort week 0, never returns
      (3L, ts("2024-01-08 10:00:00")), // u3 cohort week 1
      (3L, ts("2024-01-22 10:00:00"))  // week 3 → offset 2
    ).toDF("user_id", "ts")
    val got = Funnel.weeklyRetention(ev, "user_id", "ts", "2024-01-01")
      .orderBy($"cohort_week", $"offset_weeks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  // ------------------------------------------------------------- scd2

  test("Scd2.history opens intervals on change only and keeps the last open") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "bal")
    val v2 = Seq((1L, "a", 10.0), (2L, "b", 25.0)).toDF("k", "name", "bal") // 3 absent
    val v3 = Seq((1L, "a", 11.0), (2L, "b", 25.0), (3L, "c", 30.0)).toDF("k", "name", "bal")
    val h = Scd2.history(Seq((1L, v1), (2L, v2), (3L, v3)), "k", Seq("name", "bal"))
      .orderBy($"k", $"valid_from")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(h === Seq(
      (1L, 10.0, 1L, 3L),  // changed at v3
      (1L, 11.0, 3L, -1L), // open current
      (2L, 20.0, 1L, 2L),  // changed at v2
      (2L, 25.0, 2L, -1L),
      (3L, 30.0, 1L, -1L)  // absent from v2, re-asserted unchanged at v3:
    ))                     // ONE interval, still open (gap does not close it)
  }

  // -------------------------------------------------------------- pmi

  test("pmiPairs hand-computed on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "z q"), (4L, "z x q")
    ).toDF("doc_id", "text")
    val got = Cooccurrence.pmiPairs(docs, "doc_id", "text", 10, 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // df: x=3, y=2, z=2, q=2; pairs: (x,y)=2, (q,z)=2, (x,z)=1, (q,x)=1
    def pmi(c: Long, dfa: Long, dfb: Long) =
      math.rint(math.log(4.0 * c / (dfa * dfb)) * 1e4) / 1e4
    assert(got(("x", "y")) === (2L, pmi(2, 3, 2)))
    assert(got(("q", "z")) === (2L, pmi(2, 2, 2)))
    assert(got(("x", "z")) === (1L, pmi(1, 3, 2)))
    assert(got(("q", "x")) === (1L, pmi(1, 2, 3)))
  }

  test("pmiPairs vocabulary cut excludes out-of-vocab pairs deterministically") {
    import spark.implicits._
    // vocab=2 keeps the two highest-df tokens (ties by token string)
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // df: a=3, b=2, c=2 → top-2 = a, b (tie b<c)
    val got = Cooccurrence.pmiPairs(docs, "doc_id", "text", 2, 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("a", "b")))
  }

  // ---------------------------------------------------- rolling window

  test("rollingAgg trailing range window is inclusive on both ends and per-key") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:30:00"), 2.0),
      (3L, 10L, ts("2024-01-01 11:00:00"), 4.0),  // 10:00 is EXACTLY 1h back — included
      (4L, 10L, ts("2024-01-01 12:00:01"), 8.0),  // 11:00:00 is 1h1s back — excluded
      (5L, 99L, ts("2024-01-01 10:30:00"), 100.0) // other key, never mixed in
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Temporal.rollingAgg(ev, "user_id", "ts", "value", 3600L)
      .select($"event_id", $"n_window", $"sum_window".cast("double"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === (1L, 1.0))
    assert(got(2L) === (2L, 3.0))
    assert(got(3L) === (3L, 7.0))
    assert(got(4L) === (1L, 8.0))
    assert(got(5L) === (1L, 100.0))
  }

  // -------------------------------------------------------------- cdc

  test("Cdc.apply is last-writer-wins with deletes and late re-inserts") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    val changes = Seq(
      (1L, 2L, "update", 11.0),  // wins over the later-arriving v1 below
      (1L, 1L, "update", 99.0),
      (2L, 1L, "delete", 0.0),   // deleted...
      (2L, 2L, "insert", 22.0),  // ...then re-inserted at a higher version
      (3L, 5L, "delete", 0.0)    // deleted for good
    ).toDF("k", "version", "op", "bal")
    val got = graft.operators.Cdc.apply(base, changes, "k", "version", "op")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 11.0, 2L -> 22.0))
  }

  test("Cdc.apply with no changes returns the base unchanged") {
    import spark.implicits._
    val base = Seq((1L, 10.0)).toDF("k", "bal")
    val none = Seq.empty[(Long, Long, String, Double)].toDF("k", "version", "op", "bal")
    assert(graft.operators.Cdc.apply(base, none, "k", "version", "op")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((1L, 10.0)))
  }

  // -------------------------------------------------------- diversity

  test("ngramDiversity counts distinct vs total n-grams; gram-less groups report nulls") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y z x y z"),   // 4 trigrams: xyz, yzx, zxy, xyz → 3 distinct
      ("a", "x y z"),         // 1 trigram: xyz (already seen in group a)
      ("b", "p q")            // too short for trigrams
    ).toDF("source", "text")
    val got = graft.text.CorpusStats.ngramDiversity(docs, "source", "text", 3)
      .orderBy($"source").collect()
    assert((got(0).getString(0), got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) ===
      ("a", 2L, 5L, 3L))
    assert(got(0).getDouble(4) === 0.6)
    assert((got(1).getString(0), got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) ===
      ("b", 1L, 0L, 0L))
    assert(got(1).isNullAt(4))
  }

  // --------------------------------------------------- time to convert

  test("timeToConvert measures first-step-1 to strict-chained completion") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:10:00")),
      (1L, "purchase", ts("2024-01-01 10:30:00")), // 1800 s
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "click", ts("2024-01-01 09:01:00")),
      (2L, "purchase", ts("2024-01-01 09:02:00")), // 120 s
      (3L, "view", ts("2024-01-01 08:00:00"))      // never converts
    ).toDF("user_id", "event_type", "ts")
    val r = graft.analyze.Funnel.timeToConvert(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 960.0)   // median of {120, 1800}, interpolated
    assert(r.getDouble(2) === 1632.0)  // p90: 120 + 0.8*(1800-120)
  }

  // ------------------------------------------------------ transitions

  test("transitionMatrix counts gap-bounded consecutive pairs and normalizes per from-state") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (2L, 10L, "b", ts("2024-01-01 10:05:00")), // a→b
      (3L, 10L, "c", ts("2024-01-01 12:00:00")), // 115-min gap: NOT a transition
      (4L, 10L, "b", ts("2024-01-01 12:10:00")), // c→b
      (5L, 20L, "a", ts("2024-01-01 10:00:00")),
      (6L, 20L, "c", ts("2024-01-01 10:01:00"))  // a→c (other user)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.analyze.Funnel.transitionMatrix(ev, "user_id", "event_type",
        "ts", "event_id", 1800L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("c", "b") -> ((1L, 1.0))))
  }

  test("transitionEntropy: deterministic chain 0, uniform chain ln k") {
    import spark.implicits._
    // user 10: a→b→a→b... (deterministic); ln-k case: a→{b,c} evenly
    val det = (0 until 20).map(i =>
      (i.toLong, 10L, if (i % 2 == 0) "a" else "b",
        ts(f"2024-01-01 10:${i}%02d:00")))
    val got = graft.analyze.Funnel.transitionEntropy(
        det.toDF("event_id", "user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", "event_id", 1800L)
      .collect()
    assert(got.forall(_.getAs[Double]("h_next") == 0.0))
    assert(got.head.getAs[Double]("h_cond") == 0.0)
    val unif = (0 until 40).map { i =>
      val t = if (i % 2 == 0) "a" else if ((i / 2) % 2 == 0) "b" else "c"
      (i.toLong, 20L, t, ts(f"2024-01-01 10:${i}%02d:00"))
    }
    val got2 = graft.analyze.Funnel.transitionEntropy(
        unif.toDF("event_id", "user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", "event_id", 1800L)
      .collect().map(r => r.getAs[String]("from_type") ->
        r.getAs[Double]("h_next")).toMap
    // from state a the next is b or c with equal counts → H = ln 2
    assert(math.abs(got2("a") - math.log(2.0)) < 1e-4)
  }

  // ------------------------------------------------------- preference

  test("Preference.pairs picks best/worst with the deterministic tie contract") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, 0.9), ("s1", 2L, 0.1), ("s1", 3L, 0.5),
      ("s2", 4L, 0.7), ("s2", 5L, 0.7), ("s2", 6L, 0.7), // all ties
      ("s3", 7L, 0.3)                                    // singleton: no pair
    ).toDF("source", "doc_id", "quality")
    val got = graft.analyze.Preference.pairs(df, "source", "doc_id", "quality")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(got === Map(
      "s1" -> ((1L, 2L, 0.8)),  // margin 0.9-0.1
      "s2" -> ((4L, 6L, 0.0)))) // ties: smallest id chosen, largest rejected
  }

  // --------------------------------------------------------- gap fill

  test("gapFill forward-fills empty buckets and keeps the per-bucket latest value") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:05:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:50:00"), 2.0),  // same bucket, later → wins
      (3L, 10L, ts("2024-01-01 13:30:00"), 9.0)   // 2 empty buckets before it
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Temporal.gapFill(ev, "user_id", "ts", "event_id",
        "value", 3600L)
      .orderBy($"bucket")
      .collect().map(r => (r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got === Seq((2.0, true), (2.0, false), (2.0, false), (9.0, true)))
  }

  // ----------------------------------------------------- golden record

  test("goldenRecord keeps the latest NON-NULL per field independently") {
    import spark.implicits._
    val s1 = Seq((1L, Some("alice"), Some(10.0))).toDF("k", "name", "bal")
    val s2 = Seq((1L, None: Option[String], Some(20.0))).toDF("k", "name", "bal")
    val s3 = Seq((1L, Some("ALICE"), None: Option[Double])).toDF("k", "name", "bal")
    val got = graft.operators.Cdc.goldenRecord(
        Seq((1L, s1), (2L, s2), (3L, s3)), "k", Seq("name", "bal"))
      .collect().head
    // name: v3 wins (non-null); bal: v2 wins (v3's null never wins)
    assert((got.getLong(0), got.getString(1), got.getDouble(2)) === (1L, "ALICE", 20.0))
  }

  // -------------------------------------------------------- triangles

  test("Triangles.count and countOriented agree on a hand graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 + disjoint edge 6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val c1 = graft.graph.Triangles.count(edges, "id_a", "id_b").collect().head
    val c2 = graft.graph.Triangles.countOriented(edges, "id_a", "id_b").collect().head
    assert((c1.getLong(0), c1.getLong(1)) === (8L, 4L))
    assert((c2.getLong(0), c2.getLong(1)) === (8L, 4L))
  }

  // -------------------------------------------------------- blocklist

  test("phraseHits matches token n-grams only — no substring false positives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the assistant helped"),     // 'ass' must NOT match inside a token
      (2L, "bad stuff here bad stuff"), // bigram hits twice
      (3L, "clean text entirely"),
      (4L, "ass")                       // exact token match
    ).toDF("doc_id", "text")
    val phrases = Seq("ass", "bad stuff").toDF("phrase")
    val got = Blocklist.phraseHits(docs, "doc_id", "text", phrases)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, false),
      (2L, 2L, 1L, true),
      (3L, 0L, 0L, false),
      (4L, 1L, 1L, true)))
  }

  test("phraseHits explodes only the n-gram lengths present in the list") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // unigram-only list → trigram phrase can never match, and the plan
    // should not pay for longer grams (observable: a 3-token phrase in a
    // list alongside a matching unigram still works)
    val got = Blocklist.phraseHits(docs, "doc_id", "text",
        Seq("c", "b c d").toDF("phrase"))
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).head
    assert(got === (2L, true)) // unigram 'c' + trigram 'b c d'
  }

  // --------------------------------------- review-fix regression cases

  test("Scd2.history detects boundary-shifted and NULL-vs-empty changes") {
    import spark.implicits._
    // key 1: concatenations collide ("Customer#1"+"23.4" == "Customer#12"+"3.4")
    // key 2: NULL -> empty string is a real change under IS DISTINCT FROM
    val v1 = Seq((1L, Some("Customer#1"), Some("23.4")),
                 (2L, Option.empty[String], Some("x"))).toDF("k", "name", "bal")
    val v2 = Seq((1L, Some("Customer#12"), Some("3.4")),
                 (2L, Some(""), Some("x"))).toDF("k", "name", "bal")
    val got = Scd2.history(Seq((1L, v1), (2L, v2)), "k", Seq("name", "bal"))
      .groupBy($"k").count().orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 2L))) // both keys: two intervals each
  }

  test("Scd2.history opens an interval for an all-null first appearance") {
    import spark.implicits._
    val v1 = Seq((1L, Option.empty[String])).toDF("k", "name")
    val v2 = Seq((1L, Option.empty[String])).toDF("k", "name") // unchanged
    val got = Scd2.history(Seq((1L, v1), (2L, v2)), "k", Seq("name")).collect()
    // one interval, opened at v1 (valid_from), still open (valid_to null)
    assert(got.length === 1 && got.head.getLong(2) === 1L && got.head.isNullAt(3))
  }

  test("weeklyRetention floor-divides weeks for pre-epoch events") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2023-12-30 10:00:00")), // datediff −2 → week −1, NOT week 0
      (1L, ts("2024-01-01 10:00:00"))  // week 0 → offset 1 from cohort −1
    ).toDF("user_id", "ts")
    val got = Funnel.weeklyRetention(ev, "user_id", "ts", "2024-01-01")
      .orderBy($"offset_weeks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("funnel reports NULL conversion after a zero-user step, not 0/0") {
    import spark.implicits._
    val ev = Seq((1L, "view", ts("2024-01-01 10:00:00")),
                 (2L, "view", ts("2024-01-01 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy($"step_idx").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 0L, 0L))
    assert(got(1).getDouble(3) === 0.0) // 0 of 2 converted
    assert(got(2).isNullAt(3))          // 0 of 0: NULL, never NaN/error
  }

  test("Preference.pairs rejects a non-numeric id column loudly") {
    import spark.implicits._
    val df = Seq(("s1", "doc-a", 0.9), ("s1", "doc-b", 0.1))
      .toDF("source", "doc_id", "quality")
    val e = intercept[IllegalArgumentException] {
      graft.analyze.Preference.pairs(df, "source", "doc_id", "quality")
    }
    assert(e.getMessage.contains("doc_id"))
  }

  test("gapFill reports observed=true for a bucket whose latest value is NULL") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:05:00"), Some(3.0)),
      (2L, 10L, ts("2024-01-01 11:10:00"), Option.empty[Double]) // observed, null metric
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Temporal.gapFill(ev, "user_id", "ts", "event_id",
        "value", 3600L)
      .orderBy($"bucket")
      .collect().map(r => (r.getDouble(2), r.getBoolean(3))).toSeq
    // bucket 11:00 HAD an observation (null-valued): observed=true, value
    // forward-filled from 10:00
    assert(got === Seq((3.0, true), (3.0, true)))
  }

  test("DatasetCard excludes NULL text from distinct content and NULL lang from tie-wins") {
    import spark.implicits._
    val docs = Seq(
      ("s1", Some("en"), Some("a a a")),
      ("s1", Some("en"), Some("a a a")),          // dup of row 1
      ("s1", Option.empty[String], Some("b b")),
      ("s1", Option.empty[String], Option.empty[String]) // null text: not distinct content
    ).toDF("source", "lang", "text")
    val r = graft.analyze.DatasetCard.perSource(docs, "source", "lang", "text").collect().head
    val dupFrac = r.getDouble(r.fieldIndex("dup_frac"))
    // 2 distinct non-null texts of 4 docs → 1 − 2/4 = 0.5 (counting the
    // null-digest group as distinct would give 0.25)
    assert(dupFrac === 0.5)
    // lang counts tie 2–2: the real lang wins (NULLS LAST), not NULL
    assert(r.getString(r.fieldIndex("top_lang")) === "en")
  }
}
