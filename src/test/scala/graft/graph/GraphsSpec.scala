package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("triangles enumerates each triangle once on canonical edges") {
    // K4 on {1,2,3,4} (C(4,3)=4 triangles) plus a pendant edge 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("u", "v")
    val tri = Graphs.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("canonicalEdges dedups, orients, and drops self-loops") {
    val raw = Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("a", "b")
    val e = Graphs.canonicalEdges(raw, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 3L)))
  }

  test("triangleParticipation counts memberships with deterministic order") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val part = Graphs.triangleParticipation(Graphs.triangles(edges), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // triangles: (1,2,3) and (2,3,4) — nodes 2,3 in both, 1,4 in one
    assert(part.toSeq == Seq((2L, 2L), (3L, 2L), (1L, 1L), (4L, 1L)))
  }

  test("vertexSample is deterministic and partition-independent") {
    val ids = (1L to 1000L).toDF("id")
    val kept1 = ids.where(Graphs.vertexSample(col("id"), 30))
      .collect().map(_.getLong(0)).toSet
    val kept2 = ids.repartition(7).where(Graphs.vertexSample(col("id"), 30))
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)
    // ~30% within loose bounds — a hash-bucket, not a coin flip
    assert(kept1.size > 200 && kept1.size < 400)
    // monotone: a larger pct keeps a superset
    val kept50 = ids.where(Graphs.vertexSample(col("id"), 50))
      .collect().map(_.getLong(0)).toSet
    assert(kept1.subsetOf(kept50))
  }

  test("pagerank matches a local power iteration and conserves mass") {
    // 1→2→3→1 cycle, 4→1 feeder, 5 dangling (in-edge only)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))
    val d = 0.85
    val iters = 5
    // local reference: same recurrence, plain Scala
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var ref = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).view
        .mapValues(_.map(e => ref(e._1) / outdeg(e._1)).sum).toMap
      val dangling = nodes.filterNot(outdeg.contains).map(ref).sum
      ref = nodes.map(n => n -> ((1 - d) / nodes.size +
        d * (contrib.getOrElse(n, 0.0) + dangling / nodes.size))).toMap
    }
    val got = Graphs.pagerank(es.toDF("u", "v"), iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == ref.keySet)
    nodes.foreach(n => assert(math.abs(got(n) - ref(n)) < 1e-12, s"node $n"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass must be conserved")
  }

  test("kCore: pendant peels, clique survives, second round catches cascades") {
    import spark.implicits._
    // K4 on {1,2,3,4} + chain 4-5-6: 6 (deg 1) peels in round 1, which
    // drops 5 to deg 1 → peels in round 2; K4 (deg 3 each) survives.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val out = Graphs.kCore(edges, k = 3, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a 4-cycle has no 3-core at all
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val cedges = (cyc ++ cyc.map(_.swap)).toDF("u", "v")
    assert(Graphs.kCore(cedges, k = 3, rounds = 2).count() == 0)
  }

  test("personalizedPagerank matches a seed-restart local power iteration") {
    import spark.implicits._
    // 1→2→3→1 cycle, 4→1 feeder, 5 dangling; seeds = {1, 4}
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))
    val seeds = Seq(1L, 4L)
    val d = 0.85
    val iters = 5
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val s = nodes.map(n => n -> (if (seeds.contains(n)) 1.0 else 0.0)).toMap
    val k = seeds.size.toDouble
    var ref = nodes.map(n => n -> s(n) / k).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).view
        .mapValues(_.map(e => ref(e._1) / outdeg(e._1)).sum).toMap
      val dangling = nodes.filterNot(outdeg.contains).map(ref).sum
      ref = nodes.map(n => n -> ((1 - d) * s(n) / k +
        d * (contrib.getOrElse(n, 0.0) + dangling * s(n) / k))).toMap
    }
    val got = Graphs.personalizedPagerank(es.toDF("u", "v"),
        seeds.toDF("node"), iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == ref.keySet)
    nodes.foreach(n => assert(math.abs(got(n) - ref(n)) < 1e-12, s"node $n"))
    // non-seed-reachable mass decays: dangling node 5 holds less rank
    // than under uniform restart, and seeds dominate
    assert(got(1L) > got(5L))
  }

  test("adamicAdar: hand-computed scores, linked pairs excluded, hubs discounted") {
    import spark.implicits._
    // square 1-2-3-4-1 plus hub 5 connected to 1 and 3.
    // Non-adjacent pairs: (1,3) via {2, 4, 5}; (2,4) via {1, 3}; (2,5)
    // via {1, 3}; (4,5) via {1, 3}.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L), (3L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val out = Graphs.adamicAdar(edges, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val w2 = 1.0 / math.log(2.0) // deg(2) = deg(4) = deg(5) = 2
    val w3 = 1.0 / math.log(3.0) // deg(1) = deg(3) = 3
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set((1L, 3L), (2L, 4L), (2L, 5L), (4L, 5L)))
    assert(out((1L, 3L)) == ((3L, r6(3 * w2)))) // three degree-2 bridges
    assert(out((2L, 4L)) == ((2L, r6(2 * w3)))) // two degree-3 hubs, discounted
    assert(out((2L, 5L)) == ((2L, r6(2 * w3))))
    assert(out((4L, 5L)) == ((2L, r6(2 * w3))))
  }

  test("adamicAdar: leaf (degree-1) nodes don't crash and don't score") {
    import spark.implicits._
    // path 1-2-3 plus leaf 4 hanging off 3: deg(1)=deg(4)=1. Before the
    // deg>=2 guard, 1/ln(1)=+Inf hit Round12Long's exact path and threw
    // NumberFormatException for EVERY graph with a leaf (ADVICE r10).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val out = Graphs.adamicAdar(edges, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // non-adjacent pairs with a common neighbor: (1,3) via 2 [deg 2],
    // (2,4) via 3 [deg 2]. Leaves 1 and 4 never appear as centers.
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    assert(out((1L, 3L)) == r6(1.0 / math.log(2.0)))
    assert(out((2L, 4L)) == r6(1.0 / math.log(2.0)))
  }

  test("adamicAdar: maxDegree drops hub-centered wedges, keeps the rest") {
    import spark.implicits._
    // hub 100 connected to 1..8 (deg 8); plus a modest bridge 9 joining
    // 1 and 2 (deg 2). Uncapped: every pair (i,j) in 1..8 scores via the
    // hub; (1,2) additionally gets the bridge contribution.
    val spokes = (1L to 8L).map(i => (100L, i))
    val und = spokes ++ Seq((9L, 1L), (9L, 2L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val w9 = 1.0 / math.log(2.0)
    val wHub = 1.0 / math.log(8.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val full = Graphs.adamicAdar(edges, k = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(full((1L, 2L)) == r6(w9 + wHub))
    assert(full((3L, 4L)) == r6(wHub))
    assert(full((9L, 100L)) == r6(2 * w9)) // via centers 1 and 2
    // cap at 4: the 28 hub-CENTERED wedges vanish; wedges centered on
    // modest nodes (9, 1, 2) stay. The top-1 pair is UNCHANGED — the cap
    // sheds exactly the weakest, most numerous contributions (the
    // guardrail's recall contract).
    val capped = Graphs.adamicAdar(edges, k = 100, maxDegree = Some(4L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(capped.keySet == Set((1L, 2L), (9L, 100L)))
    assert(capped((1L, 2L)) == r6(w9)) // hub contribution shed
    assert(capped((9L, 100L)) == r6(2 * w9)) // untouched
    assert(full.maxBy(_._2)._1 == capped.maxBy(_._2)._1)
  }

  test("labelPropagation: two bridged triangles split into two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3-4; hand-rolled
    // rounds (min-label tiebreak) settle on label 1 left, label 3 right
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val out = Graphs.labelPropagation(edges, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // partitioning invariance: synchronous update + deterministic argmax
    val out7 = Graphs.labelPropagation(edges.repartition(7), rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out7 == out)
  }

  test("itemCosine: hand cosines, duplicate rows collapsed, floor applied") {
    import spark.implicits._
    // baskets: b1{1,2,3} b2{1,2} b3{1,3} b4{2,3} b5{1,2}; a duplicated
    // (b2, 1) row must not inflate any count
    val bi = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 2L), (40L, 3L), (50L, 1L), (50L, 2L),
      (20L, 1L)).toDF("basket", "item")
    val out = Graphs.itemCosine(bi, "basket", "item", minCooc = 2L, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // n₁=4 n₂=4 n₃=3; cooc (1,2)=3 (1,3)=2 (2,3)=2; ties ordered by u
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, r6(3.0 / math.sqrt(16.0))),
      (1L, 3L, 2L, r6(2.0 / math.sqrt(12.0))),
      (2L, 3L, 2L, r6(2.0 / math.sqrt(12.0)))))
    // raising the floor keeps only the 3-cooc pair
    val hi = Graphs.itemCosine(bi, "basket", "item", minCooc = 3L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hi.toSeq == Seq((1L, 2L)))
  }

  test("itemCosine: maxBasketSize drops oversized baskets and recounts " +
      "incidence consistently") {
    import spark.implicits._
    // same fixture plus a bot basket 99 holding EVERY item — uncapped it
    // inflates all coocs and popularities; capped at 2 it vanishes whole
    // and basket 10 (size 3) goes with it
    val bi = (Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 2L), (40L, 3L), (50L, 1L), (50L, 2L)) ++
      Seq(1L, 2L, 3L, 4L).map(i => (99L, i))).toDF("basket", "item")
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val capped = Graphs.itemCosine(bi, "basket", "item", minCooc = 2L,
      k = 10, maxBasketSize = Some(2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // surviving baskets: b2{1,2} b3{1,3} b4{2,3} b5{1,2} → n₁=3 n₂=3
    // n₃=2; cooc (1,2)=2 (1,3)=1 (2,3)=1 → only (1,2) clears the floor,
    // with the CAPPED graph's own popularities in the denominator
    assert(capped.toSeq == Seq((1L, 2L, 2L, r6(2.0 / math.sqrt(9.0)))))
    // None = exact over all baskets: the bot basket inflates every cooc
    // ((1,2)=4, (1,3)=3, (2,3)=3; item-4 pairs stay under the floor)
    val full = Graphs.itemCosine(bi, "basket", "item", minCooc = 2L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.toSeq == Seq((1L, 2L, 4L), (1L, 3L, 3L), (2L, 3L, 3L)))
  }
}
