package graft

import org.apache.spark.sql.functions._

/** Round-12 gates: the PPMI-SVD spectral embedding worked example, the
  * pruned source-overlap stop-shingle guard, and driver-fast-path vs
  * distributed-path equivalence for the graph round loops (the r11
  * verdict item-1 rollout: string-node frames take the bounded-driver
  * branch, non-string frames the distributed one — both must agree).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_ppmi_svd worked example -----------------------------------------
  //
  // 6 docs "wa wb wa wb wa" + 4 docs "wc wd wc wd wc":
  //   cb(wa,wb)=cb(wb,wa)=12, cb(wc,wd)=cb(wd,wc)=8, nb=40,
  //   cu = (wa 12, wb 12, wc 8, wd 8) → rk order wa,wb,wc,wd.
  //   r(wa,wb)=12·40/144=10/3 → mb=⌊log2(10/3)·1000+.5⌋=1737
  //   r(wc,wd)=8·40/64=5      → mb=⌊log2(5)·1000+.5⌋   =2322
  //   M = [[0,1737,0,0],[1737,0,0,0],[0,0,0,2322],[0,0,2322,0]]
  //   G = M·Mᵀ = diag(1737², 1737², 2322², 2322²)
  // G is diagonal with the DOUBLE eigenvalue 2322² on the wc/wd axes, so
  // BOTH top singular directions live on the {wc,wd} block:
  //   u1 ≈ (t,t,.7071,.7071)/√(1+t²), t=(1737²/2322²)^10 ≈ 0.0030
  //   u2 ≈ (t,−t,.7071,−.7071)   (the q1·w2 projection cancels exactly)
  //   λ1 ≈ λ2 ≈ 2322² → e(wc) ≈ .70710·√2322 = 34.0727
  test("ppmiSvd: planted two-block PPMI matrix — spectrum on the heavy block") {
    val docs = (
      (1 to 6).map(i => (i.toLong, "wa wb wa wb wa", "en", "s1", 14L)) ++
      (7 to 10).map(i => (i.toLong, "wc wd wc wd wc", "en", "s2", 14L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextAnalysis.ppmiSvd(docs).collect()
    assert(r.length === 4)
    assert(r.map(_.getAs[String]("word")).toSeq ===
      Seq("wa", "wb", "wc", "wd"))
    val e1 = r.map(x => x.getAs[String]("word") -> x.getAs[Double]("e1")).toMap
    val e2 = r.map(x => x.getAs[String]("word") -> x.getAs[Double]("e2")).toMap
    // block symmetry is exact double arithmetic → 6dp-equal releases
    assert(e1("wc") === e1("wd"))
    assert(e1("wa") === e1("wb"))
    assert(e2("wc") === -e2("wd"))
    // dominant-block magnitude: .70710·2322^(1/2) with the 0.3% t-leak
    assert(math.abs(e1("wc") - 34.0727) < 0.01)
    assert(math.abs(e2("wc") - 34.0727) < 0.01)
    // light-block leak after 10 iterations: t·λ^(1/4) ≈ 0.10
    assert(math.abs(e1("wa")) < 0.2)
  }

  // ---- q_source_overlap_pruned -------------------------------------------
  //
  // 20 docs; the "x y z" boilerplate shingle rides 10 of them (df 10 >
  // 20·0.2) and is pruned; "a b c" rides 2 (kept). After pruning:
  // s1 = {a b c, d e f}, s2 = {a b c, g h i} → containment 1/2 each way.
  // UNpruned keeps x y z: s1,s2 = 3 shingles, 2 shared → 666666 ppm.
  test("sourceOverlapPruned: boilerplate shingle leaves numerator AND denominator") {
    val docs = (
      (1 to 5).map(i => (i.toLong, "x y z", "en", "s1", 5L)) ++
      (6 to 10).map(i => (i.toLong, "x y z", "en", "s2", 5L)) ++
      Seq((11L, "a b c", "en", "s1", 5L), (12L, "a b c", "en", "s2", 5L),
        (13L, "d e f", "en", "s1", 5L), (14L, "g h i", "en", "s2", 5L)) ++
      (15 to 20).map(i => (i.toLong, s"u$i v$i w$i", "en", "s3", 8L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pruned = operators.Dedup.sourceOverlapPruned(docs).collect()
    assert(pruned.length === 2) // s3 shares nothing; zero rows omitted
    pruned.foreach { r =>
      assert(r.getAs[Long]("nsh_a") === 2L)
      assert(r.getAs[Long]("n_shared") === 1L)
      assert(r.getAs[Long]("containment_ppm") === 500000L)
    }
    val unpruned = operators.Dedup.sourceOverlap(docs)
      .filter(col("src_a") === "s1" && col("src_b") === "s2").collect()
    assert(unpruned.length === 1)
    assert(unpruned(0).getAs[Long]("nsh_a") === 3L)
    assert(unpruned(0).getAs[Long]("containment_ppm") === 666666L)
  }

  // ---- driver fast path ≡ distributed fallback ---------------------------
  //
  // String-node frames take the bounded-driver branch; int-node frames
  // are type-gated onto the distributed loop. Same planted graph both
  // ways → identical per-node results (the schemes are integer-exact).
  private def ints(pairs: Seq[(Int, Int)]) =
    pairs.toDF("src", "dst")
  private def strs(pairs: Seq[(Int, Int)]) =
    pairs.map { case (a, b) => (a.toString, b.toString) }.toDF("src", "dst")

  // 4-clique (ids 1-4, both directions) + a 5-6 pendant pair
  private val cliquePlus: Seq[(Int, Int)] =
    (for (a <- 1 to 4; b <- 1 to 4 if a != b) yield (a, b)) ++
      Seq((5, 6), (6, 5))

  test("kcoreOnEdges: driver (string) and distributed (int) paths agree") {
    val d = operators.Graph.kcoreOnEdges(strs(cliquePlus), k = 3, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val f = operators.Graph.kcoreOnEdges(ints(cliquePlus), k = 3, rounds = 2)
      .collect().map(r => (r.getInt(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(d.toSet === f.toSet)
    assert(d.map(_._1).sorted.toSeq === Seq("1", "2", "3", "4"))
    assert(d.forall(_._3)) // clique is the stable 3-core
  }

  test("pagerankOnEdges: driver (string) and distributed (int) paths agree") {
    val d = operators.Graph.pagerankOnEdges(strs(cliquePlus), iters = 3, k = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val f = operators.Graph.pagerankOnEdges(ints(cliquePlus), iters = 3, k = 6)
      .collect().map(r => (r.getInt(0).toString, r.getLong(1)))
    assert(d.toSet === f.toSet)
  }

  test("labelPropOnEdges: driver (string) and distributed (int) paths agree") {
    val d = operators.Graph.labelPropOnEdges(strs(cliquePlus), rounds = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    val f = operators.Graph.labelPropOnEdges(ints(cliquePlus), rounds = 3)
      .collect()
      .map(r => (r.getInt(0).toString, r.getInt(1).toString, r.getBoolean(2)))
    assert(d.toSet === f.toSet)
    // two communities: the clique labels to its min member, the pendant
    // pair to its own min
    val lab = d.map(x => x._1 -> x._2).toMap
    assert(Set(lab("1"), lab("2"), lab("3"), lab("4")).size === 1)
    assert(lab("5") === lab("6"))
    assert(lab("5") !== lab("1"))
  }

  test("pprOnEdges: driver (string) and distributed (int) paths agree") {
    val seedsS = Seq("1").toDF("node")
    val seedsI = Seq(1).toDF("node")
    val d = operators.Graph.pprOnEdges(strs(cliquePlus), seedsS,
        iters = 3, k = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val f = operators.Graph.pprOnEdges(ints(cliquePlus), seedsI,
        iters = 3, k = 6)
      .collect().map(r => (r.getInt(0).toString, r.getLong(1)))
    assert(d.toSet === f.toSet)
    // mass concentrates at the seed, and the off-component pendant pair
    // holds zero mass (no teleport, no path from the seed)
    assert(d.head._1 === "1")
    val m = d.toMap
    assert(m("5") === 0L && m("6") === 0L)
  }

  test("bfsOnEdges: driver (string) and distributed (int) paths agree") {
    // chain 1-2-3-4 symmetrized: dists 0,1,2,3 from seed 1; plus a seed
    // absent from the graph, which still releases its dist-0 row
    val chain = Seq((1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3))
    val seedsS = Seq("1", "99").toDF("node")
    val seedsI = Seq(1, 99).toDF("node")
    val d = operators.Graph.bfsOnEdges(strs(chain), seedsS, hops = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val f = operators.Graph.bfsOnEdges(ints(chain), seedsI, hops = 3)
      .collect().map(r => (r.getInt(0).toString, r.getInt(1), r.getLong(2)))
    assert(d.toSet === f.toSet)
    assert(d.filter(_._1 == "1").sortBy(_._2).map(x => (x._2, x._3)).toSeq
      === Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L)))
    assert(d.filter(_._1 == "99").toSeq === Seq(("99", 0, 1L)))
  }

  test("hitsOnEdges: driver (string) and distributed (int) paths agree") {
    // directed bipartite: hubs 1,2 both point at authority 10; hub 1
    // also points at 11
    val bip = Seq((1, 10), (2, 10), (1, 11))
    val d = operators.Graph.hitsOnEdges(strs(bip), rounds = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val f = operators.Graph.hitsOnEdges(ints(bip), rounds = 2, k = 3)
      .collect().map(r => (r.getInt(0).toString, r.getLong(1)))
    assert(d.toSet === f.toSet)
    assert(d.head._1 === "10") // two in-edges beat one
  }
}
