package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.ConnectedComponents

/** Property tests for the distributed large-star/small-star connected
  * components against a driver-side union-find oracle. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Brute-force union-find labeling: node -> min id of its component. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.filter { case (a, b) => a != b }.foreach { case (a, b) => union(a, b) }
    val nodes = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq(a, b) }.distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    import spark.implicits._
    val got = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteComponents(edges), clue)
  }

  test("matches union-find on random sparse graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val m = n + rnd.nextInt(2 * n)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges, s"trial $trial (n=$n, m=$m)")
    }
  }

  test("long chain converges in logarithmic rounds (diameter >> rounds)") {
    // a 1000-hop path is the adversarial case for naive label
    // propagation (1000 rounds); star-contraction must still finish
    // (the 64-round guard in the operator doubles as the assertion)
    val chain = (0L until 1000L).sliding(2).map(s => (s(0), s(1))).toSeq
    check(chain, "chain")
  }

  test("clique, self-loops, duplicate and reversed edges normalize away") {
    val clique = for (a <- 0L until 20L; b <- 0L until 20L if a != b) yield (a, b)
    val noisy = clique ++ Seq((5L, 5L), (3L, 1L), (1L, 3L), (30L, 31L), (31L, 30L))
    check(noisy, "noisy clique")
  }

  test("empty and all-self-loop graphs yield empty output with the right schema") {
    import spark.implicits._
    val out = ConnectedComponents.components(
      Seq((1L, 1L), (2L, 2L)).toDF("a", "b"), "a", "b")
    assert(out.columns.toSeq == Seq("id", "component"))
    assert(out.count() == 0)
  }

  test("distributed star-contraction path equals the local union-find finisher") {
    // the local finisher handles small graphs by default; pin the
    // distributed path with the conf knob and require identical labels
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val edges = (1 to 400).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong)) ++
      (500L until 520L).sliding(2).map(s => (s(0), s(1))).toSeq
    def run() = ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run()
    spark.conf.set("graft.cc.localFinishEdges", "0")
    try {
      val distributed = run()
      assert(distributed == local)
      assert(local == bruteComponents(edges))
    } finally spark.conf.unset("graft.cc.localFinishEdges")
  }

  test("labels are partitioning-invariant (1 vs 16 input partitions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    def run(parts: Int) = ConnectedComponents
      .components(edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(run(1) == run(16))
  }
}
