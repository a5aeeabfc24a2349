package graft.dedup

import scala.collection.mutable

/** Single-process exact-Jaccard/containment core for SMALL corpora — the
  * conf-gated fast path of [[Dedup.jaccardPairsOfSets]] and friends (the
  * [[ConnectedComponents]] driver-union-find / KCore localFinishEdges
  * precedent applied to the prefix-filter join family).
  *
  * WHY: the distributed prefix-filter pipeline is ~15 exchanges deep
  * (group-collapse window, distributed vocabulary rank, index join,
  * candidate self-join, two re-attach joins, member expansion) — the
  * scale-correct shape for a corpus that doesn't fit one machine, but at
  * bench scale every stage is a fixed-latency floor and the whole input
  * is a few megabytes. Below `graft.jaccard.localMaxDocs` documents the
  * caller collects the (id, shingle-set) rows in ONE job and this object
  * replays the IDENTICAL algorithm in memory: same exact-group collapse,
  * same (df, token) global rarity order, same ε-relaxed prefix/length/
  * positional bounds, same bounded-merge verification, same member
  * expansion. Every similarity is the same two-integer division the
  * distributed path computes, so outputs are bit-identical (spec-pinned
  * both paths in LocalJaccardSpec).
  *
  * Scale honesty: this path is reached only when the corpus has ALREADY
  * been counted under the gate (a `limit(max+1)` probe, not a full
  * count), so no corpus-sized collect can happen; above the gate the
  * distributed plan is untouched. */
private[dedup] object LocalJaccard {

  /** Grouped reps: `(repId, sortedRankArray)` per distinct set, plus the
    * sorted member-id list per rep. */
  private final case class Reps(ids: Array[Long], toks: Array[Array[Int]],
                                members: Map[Long, Array[Long]])

  /** Exact-group collapse + global (df asc, token asc) rarity ranking —
    * the in-memory twin of repJaccardGraph's window + withRowIndex. */
  private def collapseAndRank(docs: Array[(Long, Array[String])]): Reps = {
    // group identical sets (by content — the md5-digest contract without
    // the digest); rep = min id
    val groups = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Long]]
    val setOf = mutable.HashMap.empty[String, Array[String]]
    docs.foreach { case (id, set) =>
      val key = set.mkString("\n")
      groups.getOrElseUpdate(key, { setOf(key) = set; mutable.ArrayBuffer.empty }) += id
    }
    val repIds = new mutable.ArrayBuffer[Long]
    val repSets = new mutable.ArrayBuffer[Array[String]]
    val members = Map.newBuilder[Long, Array[Long]]
    groups.foreach { case (key, ids) =>
      val rep = ids.min
      repIds += rep
      repSets += setOf(key)
      members += rep -> ids.toArray.sorted
    }
    // document frequency over representatives, rank by (df, tok)
    val df = mutable.HashMap.empty[String, Int]
    repSets.foreach(_.foreach(t => df(t) = df.getOrElse(t, 0) + 1))
    val rank = df.keys.toArray
      .sortWith((a, b) => if (df(a) != df(b)) df(a) < df(b) else a < b)
      .zipWithIndex.toMap
    val toks = repSets.map(s => s.map(rank).sorted).toArray
    // deterministic rep order (by id) so candidate enumeration — and
    // therefore nothing observable, since verification is exact — is
    // stable run to run
    val order = repIds.indices.sortBy(repIds)
    Reps(order.map(repIds).toArray, order.map(toks).toArray, members.result())
  }

  /** Bounded sorted-int-merge overlap — the in-memory twin of the 3-arg
    * `graft_sorted_overlap`: bails when the remaining suffixes can't
    * reach `minOverlap`. */
  private def overlap(a: Array[Int], b: Array[Int], minOverlap: Double): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (c + math.min(a.length - i, b.length - j) < minOverlap) return c
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** ε-relaxed probing-prefix length: `n − ⌈τ·n − ε⌉ + 1`, clamped to
    * `n` (τ = 0 yields n + 1; the distributed `slice` clamps the same
    * way). */
  private def prefixLen(n: Int, tau: Double): Int =
    math.min(n, n - math.ceil(n * tau - 1e-9).toInt + 1)

  /** Flat-int posting lists keyed by the dense token rank — the boxed
    * `HashMap[Int, ArrayBuffer[(Int, Int)]]` index cost ~10× the whole
    * verification work on small-vocabulary corpora (a 31-token template
    * vocab drives 7M candidate hits through tuple unboxing and a boxed
    * global `HashSet[Long]` dedup — profiled 12.4 s for 2k true pairs at
    * sf0.1). Ranks are 0..V−1 by construction, so the index is an array;
    * candidates dedup per probe via a stamp array at their FIRST index
    * collision, which is also where the positional bound is exact: under
    * the shared ascending rank order no common token can precede the
    * first collision (an earlier common token would itself have collided
    * first — rank(b(op)) < rank(b(j)) for op < j contradicts
    * rank(a(p')) < rank(a(p)) for p' < p), so
    * `overlap ≤ min(na − p, nb − op)` holds exactly there and trying
    * later (strictly tighter) positions — what the old loop did — can
    * never rescue a candidate. */
  private final class Postings(vocab: Int) {
    private val heads = Array.fill(vocab)(-1) // head slot per token, -1 empty
    private var rs = new Array[Int](1024) // candidate rep index
    private var ops = new Array[Int](1024) // its position for that token
    private var nxt = new Array[Int](1024) // next slot in this token's chain
    private var n = 0
    def add(tok: Int, r: Int, op: Int): Unit = {
      if (n == rs.length) {
        rs = java.util.Arrays.copyOf(rs, n * 2)
        ops = java.util.Arrays.copyOf(ops, n * 2)
        nxt = java.util.Arrays.copyOf(nxt, n * 2)
      }
      rs(n) = r; ops(n) = op; nxt(n) = heads(tok); heads(tok) = n; n += 1
    }
    /** Walk token `tok`'s postings: `f(candidate, candidatePos)`. */
    def foreach(tok: Int)(f: (Int, Int) => Unit): Unit = {
      var s = heads(tok)
      while (s >= 0) { f(rs(s), ops(s)); s = nxt(s) }
    }
  }

  private def vocabSize(reps: Reps): Int = {
    var v = 0
    reps.toks.foreach { t => if (t.nonEmpty && t(t.length - 1) >= v) v = t(t.length - 1) + 1 }
    v
  }

  /** Rep-level Jaccard ≥ τ pairs `(ia, ib, j)` as indexes into `reps`
    * with `ids(ia) < ids(ib)`. */
  private def repJaccardPairs(reps: Reps, tau: Double)
      : mutable.ArrayBuffer[(Int, Int, Double)] = {
    val index = new Postings(vocabSize(reps))
    val stamp = Array.fill(reps.ids.length)(-1)
    val out = new mutable.ArrayBuffer[(Int, Int, Double)]
    var r = 0
    while (r < reps.ids.length) {
      val ta = reps.toks(r); val na = ta.length
      val lp = prefixLen(na, tau)
      var p = 0
      while (p < lp) {
        index.foreach(ta(p)) { (o, op) =>
          // first collision only (stamp): the sound positional-bound site
          if (stamp(o) != r) {
            stamp(o) = r
            val tb = reps.toks(o); val nb = tb.length
            val minOv = (na + nb) * tau / (1 + tau) - 1e-9
            // length + positional bounds (ε semantics of the candidate join)
            if (na >= nb * tau - 1e-9 && nb >= na * tau - 1e-9 &&
                math.min(na - p, nb - op) >= minOv) {
              val c = overlap(ta, tb, minOv)
              val j = c.toDouble / (na + nb - c).toDouble
              if (j >= tau) {
                // reps are enumerated in ascending-id order, so o < r
                // implies ids(o) < ids(r)
                out += ((o, r, j))
              }
            }
          }
        }
        p += 1
      }
      p = 0
      while (p < lp) { index.add(ta(p), r, p); p += 1 }
      r += 1
    }
    out
  }

  /** Member-expanded exact Jaccard pairs `(id_a, id_b, jaccard)` —
    * within-group 1.0 pairs plus rep-pair expansion, UNROUNDED (the
    * caller applies the same `round(_, 4)` column as the distributed
    * path). */
  def jaccardPairs(docs: Array[(Long, Array[String])], tau: Double)
      : Seq[(Long, Long, Double)] = {
    val reps = collapseAndRank(docs)
    val out = new mutable.ArrayBuffer[(Long, Long, Double)]
    expandWithin(reps, out)
    repJaccardPairs(reps, tau).foreach { case (ia, ib, j) =>
      expandCross(reps, ia, ib, j, out)
    }
    out.toSeq
  }

  /** Member-expanded exact containment pairs `(id_a, id_b, containment)`
    * with containment = |∩| / min(|A|, |B|), unrounded. */
  def containmentPairs(docs: Array[(Long, Array[String])], tau: Double)
      : Seq[(Long, Long, Double)] = {
    val reps = collapseAndRank(docs)
    // postings: EVERY token of every rep (the index side); probes walk
    // their own ε-prefix. Orientation: probe is the smaller set, ties by
    // smaller id — each pair generated from exactly one side. Same
    // flat-array index + first-collision stamp as repJaccardPairs (the
    // index holds all of b's positions, so an earlier common token would
    // still have collided earlier — the first-collision bound is exact).
    val index = new Postings(vocabSize(reps))
    var r = 0
    while (r < reps.ids.length) {
      val ta = reps.toks(r)
      var p = 0
      while (p < ta.length) { index.add(ta(p), r, p); p += 1 }
      r += 1
    }
    val stamp = Array.fill(reps.ids.length)(-1)
    val out = new mutable.ArrayBuffer[(Long, Long, Double)]
    expandWithin(reps, out)
    r = 0
    while (r < reps.ids.length) {
      val ta = reps.toks(r); val na = ta.length
      val minOv = na * tau - 1e-9
      val lp = prefixLen(na, tau)
      var p = 0
      while (p < lp) {
        index.foreach(ta(p)) { (o, op) =>
          if (stamp(o) != r) {
            stamp(o) = r
            val nb = reps.toks(o).length
            if ((na < nb || (na == nb && reps.ids(r) < reps.ids(o))) &&
                math.min(na - p, nb - op) >= minOv) {
              val c = overlap(ta, reps.toks(o), minOv)
              val cont = c.toDouble / na.toDouble
              if (cont >= tau) expandCross(reps, r, o, cont, out)
            }
          }
        }
        p += 1
      }
      r += 1
    }
    out.toSeq
  }

  /** Connected components of the ≥ τ Jaccard graph, member-expanded:
    * `(id, component)` with component = cluster-minimum id — the
    * jaccardComponentsOfSets contract. */
  def jaccardComponents(docs: Array[(Long, Array[String])], tau: Double)
      : Seq[(Long, Long)] = {
    val reps = collapseAndRank(docs)
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = root; c = n }
      root
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      // union by min keeps the root the component minimum directly
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    repJaccardPairs(reps, tau).foreach { case (ia, ib, _) =>
      union(reps.ids(ia), reps.ids(ib))
    }
    val out = new mutable.ArrayBuffer[(Long, Long)]
    reps.members.foreach { case (rep, ms) =>
      val label = find(rep)
      ms.foreach(m => out += ((m, label)))
    }
    out.toSeq
  }

  /** Keep-min-id removal set of a pair graph: union-find by minimum over
    * the edges; removed = every touched id that is not its component's
    * minimum (the distributed CC + `id != component` contract). */
  def removedByKeepMin(pairs: Iterable[(Long, Long)]): Set[Long] = {
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = root; c = n }
      root
    }
    val touched = mutable.HashSet.empty[Long]
    pairs.foreach { case (a, b) =>
      touched += a; touched += b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    touched.filter(id => find(id) != id).toSet
  }

  /** Within-group 1.0 pairs: all (a < b) member combinations of every
    * exact-duplicate group. */
  private def expandWithin(reps: Reps,
                           out: mutable.ArrayBuffer[(Long, Long, Double)]): Unit =
    reps.members.valuesIterator.foreach { ms =>
      var i = 0
      while (i < ms.length) {
        var j = i + 1
        while (j < ms.length) { out += ((ms(i), ms(j), 1.0)); j += 1 }
        i += 1
      }
    }

  /** Cross-group expansion: every member combination of the two groups,
    * ids ordered (least, greatest), similarity carried. */
  private def expandCross(reps: Reps, ia: Int, ib: Int, sim: Double,
                          out: mutable.ArrayBuffer[(Long, Long, Double)]): Unit = {
    val ma = reps.members(reps.ids(ia)); val mb = reps.members(reps.ids(ib))
    var i = 0
    while (i < ma.length) {
      var j = 0
      while (j < mb.length) {
        val a = ma(i); val b = mb(j)
        out += ((math.min(a, b), math.max(a, b), sim))
        j += 1
      }
      i += 1
    }
  }
}
