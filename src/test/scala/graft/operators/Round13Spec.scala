package graft.operators

import graft.SparkSpec

/** Round-13 gates (the r12 verdict's item-1 closure): the WEIGHTED rank
  * scheme's driver fast path vs distributed fallback — previously the
  * fallback was dead code in every test, and non-string callers would
  * have ClassCastException'd inside weightedRankRounds instead of taking
  * it. Lives in graft.operators to reach the private[operators] entry
  * point directly (the queries-level textRank/pagerankTransitions tests
  * stay in Round10Spec).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // planted weighted graph: 1↔2 with weight 3, 2↔3 with weight 1.
  //   wout: 1→3, 2→4, 3→1; n = 3, seed rank = 10⁶ div 3 = 333333,
  //   teleport = 150000 div 3 = 50000.
  // One round, contribution (850·rank·w) div (1000·wout):
  //   1→2: (850·333333·3) div 3000 = 283333
  //   2→1: (850·333333·3) div 4000 = 212499
  //   2→3: (850·333333·1) div 4000 =  70833
  //   3→2: (850·333333·1) div 1000 = 283333
  //   rank(1) = 50000+212499 = 262499
  //   rank(2) = 50000+283333+283333 = 616666
  //   rank(3) = 50000+70833 = 120833
  private val wEdges: Seq[(Int, Int, Long)] =
    Seq((1, 2, 3L), (2, 1, 3L), (2, 3, 1L), (3, 2, 1L))
  private def strs = wEdges.map { case (a, b, n) => (a.toString, b.toString, n) }
    .toDF("src", "dst", "n")
  private def ints = wEdges.toDF("src", "dst", "n")

  test("weightedRank: one round matches the hand-computed fixed point") {
    val r = Graph.weightedRank(strs, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("1" -> 262499L, "2" -> 616666L, "3" -> 120833L))
  }

  test("weightedRank: driver (string) and distributed (int) paths agree") {
    val d = Graph.weightedRank(strs, iters = 6).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val f = Graph.weightedRank(ints, iters = 6).collect()
      .map(x => (x.getInt(0).toString, x.getLong(1)))
    assert(d.toSet === f.toSet)
    assert(d.length === 3)
  }

  test("weightedRank: empty edge frame releases an empty frame on both paths") {
    val es = Seq.empty[(String, String, Long)].toDF("src", "dst", "n")
    val ei = Seq.empty[(Int, Int, Long)].toDF("src", "dst", "n")
    assert(Graph.weightedRank(es, iters = 3).collect().isEmpty)
    assert(Graph.weightedRank(ei, iters = 3).collect().isEmpty)
  }

  // ---- q_louvain_move worked example --------------------------------------
  //
  // Two triangles {1,2,3} and {4,5,6} plus bridge node 7 — {1,4,5}.
  // LPA (3 rounds, self-loop votes, min-label ties): r1 labels every
  // triangle to its min member and 7 → "1" (tie {1,4,5,7} → "1"); r2
  // node 7 votes "1":2 (1, self) vs "4":2 (4, 5) → tie → "1"; stable.
  // Partition: A = {1,2,3,7} → "1", B = {4,5,6} → "4".
  // M2 = 18, deg = (1:3, 2:2, 3:2, 4:3, 5:3, 6:2, 7:3),
  // Σtot("1") = 10, Σtot("4") = 8. Gains ×2m²:
  //   node 7 → "4": 18·(2−1) − 3·(8−10+3) = 15  → MOVES
  //   node 4 → "1": 18·(1−2) − 3·(10−8+3) = −33 → stays
  //   node 5 → "1": 18·(1−2) − 3·(10−8+3) = −33 → stays
  //   nodes 1,2,3,6: no out-of-community neighbor → gain 0
  private val bridge: Seq[(Int, Int)] = {
    val tri1 = Seq((1, 2), (1, 3), (2, 3))
    val tri2 = Seq((4, 5), (4, 6), (5, 6))
    val br = Seq((7, 1), (7, 4), (7, 5))
    (tri1 ++ tri2 ++ br).flatMap { case (a, b) => Seq((a, b), (b, a)) }
  }

  test("louvainMove: hand-computed gains on the bridge graph (driver path)") {
    val edges = bridge.map { case (a, b) => (a.toString, b.toString) }
      .toDF("src", "dst")
    val r = Graph.louvainMoveOnEdges(edges, rounds = 3).collect()
      .map(x => x.getString(0) ->
        ((x.getString(1), x.getString(2), x.getBoolean(3), x.getLong(4))))
      .toMap
    assert(r.size === 7)
    assert(r("7") === (("1", "4", true, 15L)))
    assert(r("4") === (("4", "4", false, -33L)))
    assert(r("5") === (("4", "4", false, -33L)))
    Seq("1", "2", "3").foreach(n => assert(r(n) === (("1", "1", false, 0L))))
    assert(r("6") === (("4", "4", false, 0L)))
  }

  test("louvainMove: driver (string) and distributed (int) paths agree") {
    val d = Graph.louvainMoveOnEdges(
        bridge.map { case (a, b) => (a.toString, b.toString) }
          .toDF("src", "dst"), rounds = 3)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2),
        x.getBoolean(3), x.getLong(4)))
    val f = Graph.louvainMoveOnEdges(bridge.toDF("src", "dst"), rounds = 3)
      .collect()
      .map(x => (x.getInt(0).toString, x.getInt(1).toString,
        x.getInt(2).toString, x.getBoolean(3), x.getLong(4)))
    assert(d.toSet === f.toSet)
  }

  // Post-move partition on the bridge graph: node 7 defects, so
  // {1,2,3} → "1" and {4,5,6,7} → "4". Coarse graph (directed
  // symmetrized counts): 6 inside "1" (triangle), 10 inside "4"
  // (triangle 6 + the four 7↔4/7↔5 edges), and the surviving 1↔7
  // bridge gives 1 each way. Σ = 18 = M2.
  test("louvainCoarse: hand-computed community graph, both paths agree") {
    val d = Graph.louvainCoarseOnEdges(
        bridge.map { case (a, b) => (a.toString, b.toString) }
          .toDF("src", "dst"), rounds = 3)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(d.toSeq === Seq(
      ("1", "1", 6L), ("1", "4", 1L), ("4", "1", 1L), ("4", "4", 10L)))
    val f = Graph.louvainCoarseOnEdges(bridge.toDF("src", "dst"), rounds = 3)
      .collect()
      .map(x => (x.getInt(0).toString, x.getInt(1).toString, x.getLong(2)))
    assert(d.toSet === f.toSet)
  }

  // Conductance of the PRE-move LPA partition {1,2,3,7}/"1", {4,5,6}/"4":
  // vol("1") = 3+2+2+3 = 10, cut("1") = |7→4, 7→5| = 2,
  // vol("4") = 8, cut("4") = |4→7, 5→7| = 2, M2 = 18.
  //   φ("1") = 10⁶·2 div min(10, 18−10) = 250000
  //   φ("4") = 10⁶·2 div min(8, 10)     = 250000
  test("conductance: hand-computed cut quality, both paths agree") {
    val d = Graph.conductanceOnEdges(
        bridge.map { case (a, b) => (a.toString, b.toString) }
          .toDF("src", "dst"), rounds = 3)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(d.toSeq === Seq(
      ("1", 4L, 10L, 2L, 250000L), ("4", 3L, 8L, 2L, 250000L)))
    val f = Graph.conductanceOnEdges(bridge.toDF("src", "dst"), rounds = 3)
      .collect()
      .map(x => (x.getInt(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(d.toSet === f.toSet)
  }

  // a single community owns every edge: denominator min(vol, m2−vol) is
  // 0 and so is the cut — released as conductance 0, not a /0 throw
  test("conductance: all-edges-internal community releases 0") {
    val tri = Seq((1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2))
    val d = Graph.conductanceOnEdges(
        tri.map { case (a, b) => (a.toString, b.toString) }
          .toDF("src", "dst"), rounds = 3)
      .collect()
    assert(d.length === 1)
    assert(d(0).getLong(2) === 6L) // vol = every directed edge
    assert(d(0).getLong(3) === 0L)
    assert(d(0).getLong(4) === 0L)
    val f = Graph.conductanceOnEdges(tri.toDF("src", "dst"), rounds = 3)
      .collect()
    assert(f.length === 1 && f(0).getLong(4) === 0L)
  }

  // ---- q_dedup_wjaccard worked example ------------------------------------
  //
  // base = "w01 … w20" → 18 tri-shingles, each tf 1, tot 18.
  // d2 = base exactly → identical tf multiset: every band collides, so
  //   the pair is a GUARANTEED candidate; Σmin = Σmax = 18 → 10⁶ ppm.
  // d3 = base twice → the 18 base shingles at tf 2 plus the two seam
  //   shingles (w19 w20 w01, w20 w01 w02) at tf 1, tot 38; vs base:
  //   Σmin = 18, Σmax = 18+38−18 = 38 → ⌊18·10⁶/38⌋ = 473684 ppm — a
  //   SET-Jaccard tier scores this pair 18/20 = 0.9.
  test("weightedJaccardNearDups: exact-dup and doubled-doc ppm values") {
    val base = (1 to 20).map(i => f"w$i%02d").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, base + " " + base)
    ).toDF("doc_id", "text")
    val r = Dedup.weightedJaccardNearDups(docs, "doc_id", "text",
        thresholdPpm = 0L, hasher = Dedup.Md5Hash)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    // the exact-dup pair collides in every band — always a candidate
    assert(r((1L, 2L)) === ((18L, 1000000L)))
    // the doubled pairs band-collide on this fixture (deterministic md5)
    assert(r((1L, 3L)) === ((18L, 473684L)))
    assert(r((2L, 3L)) === ((18L, 473684L)))
  }

  test("pagerankOnEdges/pprOnEdges: empty graph releases empty, not /0") {
    val e = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pagerankOnEdges(e, iters = 2, k = 5).collect().isEmpty)
    val seeds = Seq("1").toDF("node")
    assert(Graph.pprOnEdges(e, seeds, iters = 2, k = 5).collect().isEmpty)
  }
}
