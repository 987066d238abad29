package graft.queries

import graft.graph.Graphs
import graft.stats.{Profile, Sketches}
import graft.util.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Data-profiling coverage ([[graft.stats.Profile]]): key-skew audit,
  * ANALYZE-style column profiles, tolerance-checked sketch quantiles.
  */
object StatsQueries extends QueryPack {

  /** The hash-sampled co-purchase edge graph every graph query runs over:
    * canonical u<v part pairs sharing an order (the shared construction
    * factored out of the seven graph queries). Deliberately the self-join
    * shape with NO lineage cut: the repeated consumption downstream (both
    * union directions, wedge legs, seed sets) is deduplicated by
    * AQE/ReuseExchange over the canonical distinct exchange, and an r16
    * A/B measured both a per-order collect_set pair expansion (interpreted
    * HOF cost) and a lineage cut here SLOWER than this shape.
    */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .where(Graphs.vertexSample(col("l_partkey"), 30))
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  /** [[copurchaseEdges]] in BOTH directions — the undirected-graph input
    * shape pagerank/kcore/lpa/adamicAdar take.
    */
  private def copurchaseGraph(s: SparkSession, dir: String): DataFrame = {
    val ce = copurchaseEdges(s, dir)
    ce.unionAll(ce.select(col("v").as("u"), col("u").as("v")))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pre-shuffle skew audit on the events join key.
    "q_skew_audit" -> ((s, dir) =>
      Profile.skewAudit(Tables.events(s, dir), "user_id", k = 10)),

    // Gini coefficient of per-source character volume — the corpus-
    // balance number a mixture plan is judged by. Exact integer rank
    // identity, one group agg + one 1-row fold.
    "q_gini" -> ((s, dir) =>
      Profile.giniByGroup(Tables.documents(s, dir), "source", "n_chars")),

    // PSI drift between deterministic document halves over n_chars —
    // the admit-this-batch? dataset drift monitor. One groupBy per
    // slice + a bin join; Σ psi_term is the PSI.
    "q_psi_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Profile.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "n_chars", binWidth = 200L, nBins = 10)
    }),

    // Distinct-users-per-type served from a pre-aggregated HLL sketch
    // table (one sketch per (type, day) cell, merged at query time) —
    // the interactive-dashboard path that never rescans raw events.
    // Tolerance oracle: exact distinct + a within-5% flag, like
    // q_approx_distinct.
    "q_hll_served" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sketches = Profile.hllSketchTable(
        ev.withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), "user_id")
      val served = Profile.hllServe(sketches, Seq("event_type"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(served, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_distinct") - col("exact_users")).cast("double") /
            col("exact_users").cast("double") <= 0.05)
            .as("approx_within_5pct"))
    }),

    // Quantiles served from a pre-aggregated KLL sketch table (one sketch
    // per (type, day) cell, merged + read at query time) — the q_hll_served
    // pattern for ORDER STATISTICS. The audit recomputes each served
    // value's exact normalized rank and asserts it within the sketch's
    // rank-error guarantee (k=200 → ~1.65%; gate at 2%).
    "q_kll_served" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sketches = Sketches.kllSketchTable(
        ev.withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), "value")
      val served = Sketches.kllServeQuantiles(sketches, Seq("event_type"),
        Seq(0.5, 0.9, 0.99))
      Sketches.kllRankAudit(ev, served, Seq("event_type"), "value",
        tol = 0.02)
    }),

    // Segment set algebra served from a Theta sketch table — the thing HLL
    // cannot do: cells built per (type, day) are INTERSECTED and DIFFERENCED
    // at query time across segments never co-grouped at build time
    // ("clicked on day 1 or 2, AND purchased on day 2"). Exact counts +
    // a within-5% flag (tolerance contract).
    "q_theta_served" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("day", to_date(col("ts")))
      val d1 = ev.agg(min(col("day")).as("d"))
      val cells = Sketches.thetaSketchTable(ev, Seq("event_type", "day"),
        "user_id")
      val withD = cells.crossJoin(broadcast(d1))
      val a = Sketches.thetaUnion(withD.where(col("event_type") === "click" &&
        (col("day") === col("d") || col("day") === date_add(col("d"), 1))))
      val b = Sketches.thetaUnion(withD.where(
        col("event_type") === "purchase" && col("day") === date_add(col("d"), 1)))
      val approx = Sketches.thetaSetAlgebra(a, b)
      // exact flags in ONE raw pass: per-user membership bools, then counts
      val flags = ev.crossJoin(broadcast(d1)).groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "click" &&
            (col("day") === col("d") || col("day") === date_add(col("d"), 1)),
            1).otherwise(0)).as("in_a"),
          max(when(col("event_type") === "purchase" &&
            col("day") === date_add(col("d"), 1), 1).otherwise(0)).as("in_b"))
      val exact = flags.agg(
        sum(col("in_a")).cast("long").as("n_a"),
        sum(col("in_b")).cast("long").as("n_b"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"),
        sum(col("in_a") * (lit(1) - col("in_b"))).cast("long").as("n_only_a"))
      def ok(approxC: Column, exactC: Column): Column =
        (exactC === 0L && approxC < 0.5) ||
          (exactC > 0L && abs(approxC - exactC.cast("double")) /
            exactC.cast("double") <= 0.05)
      exact.crossJoin(approx).select(
        col("n_a"), col("n_b"), col("n_both"), col("n_only_a"),
        (ok(col("approx_a"), col("n_a")) && ok(col("approx_b"), col("n_b")) &&
          ok(col("approx_both"), col("n_both")) &&
          ok(col("approx_only_a"), col("n_only_a"))).as("approx_ok"))
    }),

    // Heavy-hitter users served from a frequent-items state table (one
    // accumulate per day cell, combined + estimated at query time). The
    // audit pins the exact top-5 (deterministic tie-break) and flags each
    // found in the served top-20 with its estimate within the sketch's
    // ANALYTIC guarantee, |est − n| ≤ 3.5·N/maxItemsTracked (the
    // Misra–Gries/ItemsSketch a-priori bound over the merged stream
    // weight N) — NOT a fixed percentage: a 5% tolerance calibrated at
    // one SF broke at the sf1 sweep (10× more distinct users dilute the
    // same top counts), which is precisely the scale-dependent-test bug
    // class the three-point sweep exists to catch. The guarantee-based
    // flag is scale-invariant and still fails on real sketch breakage
    // (item loss, merge corruption).
    "q_topk_served" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val states = Sketches.topKSketchTable(
        ev.withColumn("day", to_date(col("ts"))), Seq("day"), "user_id",
        maxItemsTracked = 8192)
      // serve capacity covers the union of tracked items across the ≤32
      // day cells (cells × 8192) — see topKServe's overflow contract
      val served = Sketches.topKServe(states, Seq(), k = 20,
        maxItemsTracked = 8192, serveCapacity = 32 * 8192)
      val bound = ev.groupBy().agg(
        (count(lit(1)).cast("double") * 3.5 / 8192.0).as("__err"))
      // the FI guarantee also bounds a MISS: an item absent from the
      // served top-20 cannot out-count the 20th served estimate by more
      // than the error — the correct claim when 10× distinct items push
      // a true heavy hitter inside the noise floor
      val floor = served.groupBy().agg(
        min(col("est_count")).cast("double").as("__floor"))
      val top5 = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(5)
        .withColumn("rnk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("user_id").asc)).cast("long"))
      top5.join(served, top5("user_id") === served("item"), "left_outer")
        .crossJoin(broadcast(bound)).crossJoin(broadcast(floor))
        .select(col("user_id"), col("n"), col("rnk"),
          (when(col("item").isNotNull,
            abs(col("est_count") - col("n")).cast("double") <= col("__err"))
            .otherwise(col("n").cast("double") <= col("__floor") + col("__err")))
            .as("served_ok"))
    }),

    // Deequ-style data-quality constraint suite: five admission checks in
    // two scans (orders metrics fused into one aggregate; referential
    // integrity as one join). The gate output is (check, metric, passed) —
    // any constraint regression flips a row and fails the hash compare.
    "q_dq_checks" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val om = o.agg(
        count(lit(1)).cast("double").as("cnt"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .cast("double").as("nulls"),
        countDistinct(col("o_orderkey")).cast("double").as("ndv"),
        min(col("o_totalprice")).as("minp"),
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .cast("double").as("indom"))
      val orderChecks = om.select(explode(array(
        struct(lit("orders.o_custkey.completeness").as("check"),
          round(lit(1.0) - col("nulls") / col("cnt"), 6).as("metric"),
          (col("nulls") === 0.0).as("passed")),
        struct(lit("orders.o_orderkey.uniqueness").as("check"),
          round(col("ndv") / col("cnt"), 6).as("metric"),
          (col("ndv") === col("cnt")).as("passed")),
        struct(lit("orders.o_totalprice.min_positive").as("check"),
          round(col("minp"), 6).as("metric"),
          (col("minp") > 0.0).as("passed")),
        struct(lit("orders.o_orderstatus.domain").as("check"),
          round(col("indom") / col("cnt"), 6).as("metric"),
          (col("indom") === col("cnt")).as("passed")))).as("c"))
        .select(col("c.check"), col("c.metric"), col("c.passed"))
      val ri = li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_outer")
        .agg(count(lit(1)).cast("double").as("cnt"),
          count(col("o_orderkey")).cast("double").as("matched"))
        .select(lit("lineitem.l_orderkey.ref_integrity").as("check"),
          round(col("matched") / col("cnt"), 6).as("metric"),
          (col("matched") === col("cnt")).as("passed"))
      orderChecks.unionAll(ri)
    }),

    // Catalog stats for three heterogeneous lineitem columns in one pass.
    "q_table_stats" -> ((s, dir) =>
      Profile.columnProfile(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_quantity", "l_returnflag"))),

    // Sketch quantiles under the tolerance contract (exact value + flag
    // asserting the sketch is within 5%): the q_approx_distinct pattern.
    "q_approx_quantiles" -> ((s, dir) =>
      Profile.approxQuantiles(Tables.documents(s, dir), "n_chars",
        ps = Seq(0.5, 0.9, 0.99), accuracy = 10000, tol = 0.05)),

    // Winsorization audit: per-type p05/p95 bounds and clip counts.
    "q_winsorize" -> ((s, dir) =>
      Profile.winsorizeStats(Tables.events(s, dir), "event_type", "value",
        lo = 0.05, hi = 0.95)),

    // Per-user OLS trend of value over event rank — drift monitoring.
    "q_regression" -> ((s, dir) =>
      Profile.groupRegression(Tables.events(s, dir), "user_id",
        Seq(col("ts").asc, col("event_id").asc), "value")),

    // Triangle participation in the hash-sampled co-purchase graph
    // (parts sharing an order; 30% vertex sample = colorful estimator).
    "q_triangles" -> ((s, dir) =>
      Graphs.triangleParticipation(
        Graphs.triangles(copurchaseEdges(s, dir)), 20)),

    // PageRank centrality over the same co-purchase graph (undirected →
    // each canonical edge in both directions), 5 damped power iterations,
    // top-20 parts. Oracle = the identical unrolled recurrence in SQL.
    "q_pagerank" -> ((s, dir) =>
      Graphs.pagerank(copurchaseGraph(s, dir), iters = 5, damping = 0.85)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node").asc)
        .limit(20)),

    // Adamic–Adar link prediction over the same sampled co-purchase
    // graph: top-20 NOT-yet-linked part pairs by common-neighbor score
    // (hub neighbors discounted 1/ln deg). One wedge join + anti-join;
    // decimal-routed weights make the pair sum order-independent.
    "q_adamic_adar" -> ((s, dir) =>
      Graphs.adamicAdar(copurchaseGraph(s, dir), k = 20)),

    // The HUB-CAPPED Adamic–Adar path (maxDegree = 40 binds on the
    // co-purchase graph's hub tail — degrees run 9..63, median 32):
    // wedges centered on deg > 40 nodes are dropped, which is the
    // 100-TB power-law guardrail. Oracle applies the identical cap in
    // its ew CTE, so the surviving scores are hash-exact — the capped
    // path is oracle-gated, not just spec-pinned.
    "q_adamic_adar_capped" -> ((s, dir) =>
      Graphs.adamicAdar(copurchaseGraph(s, dir), k = 20,
        maxDegree = Some(40L))),

    // Personalized PageRank from a 5%-hash seed set over the sampled
    // co-purchase graph — proximity-to-seeds ("related parts"), top-20.
    // Oracle = the identical unrolled recurrence with seed-directed
    // restart and dangling teleport.
    "q_ppr" -> ((s, dir) => {
      val edges = copurchaseGraph(s, dir)
      val seeds = edges.select(col("u").as("node"))
        .union(edges.select(col("v").as("node"))).distinct()
        .where(Graphs.vertexSample(col("node"), 5))
      Graphs.personalizedPagerank(edges, seeds, iters = 5, damping = 0.85)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node").asc)
        .limit(20)
    }),

    // 4-round 3-core peeling of the sampled co-purchase graph: the
    // dense-region extractor (sparse periphery peels away round by
    // round). Oracle = the identical unrolled induction in SQL.
    "q_kcore" -> ((s, dir) =>
      Graphs.kCore(copurchaseGraph(s, dir), k = 3, rounds = 4)),

    // 4-round deterministic label propagation over the same sampled
    // co-purchase graph: each node adopts its neighbors' most frequent
    // label (min-label ties) — community detection one power-step at a
    // time. Oracle = the identical unrolled argmax recursion in SQL.
    "q_lpa" -> ((s, dir) =>
      Graphs.labelPropagation(copurchaseGraph(s, dir), rounds = 4)),

    // Item-item collaborative filtering over the UNsampled co-purchase
    // relation: top-20 part pairs by cosine on basket incidence
    // (cooc/√(n_u·n_v), cooc ≥ 2) — "ordered together" recommendation,
    // popularity-normalized where Adamic–Adar is neighbor-discounted.
    "q_item_cf" -> ((s, dir) =>
      Graphs.itemCosine(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minCooc = 2L, k = 20)),

    // Benford first-digit audit of extended price — the synthetic-data
    // detector (TPC-H prices are price-list-derived, so the χ² column
    // is exactly what flags them as non-natural). String-based digit
    // extraction, ln/ln(10) expected chain replayed identically.
    "q_benford" -> ((s, dir) =>
      Profile.benfordAudit(Tables.lineitem(s, dir), "l_extendedprice"))
  )

  /** Unrolled PageRank oracle: the same per-iteration recurrence as
    * [[Graphs.pagerank]] — weights precomputed as 1/outdeg so both engines
    * run the identical float ops (sum of rank·w, never rank/deg).
    *
    * Every CTE is MATERIALIZED — value-identical, but bounded-memory:
    * DuckDB inlines plain CTEs as views, and with r(k) referenced twice
    * per step (contrib + dangling) the un-materialized plan re-expands
    * the whole subtree INCLUDING the co-purchase self-join 2^iters
    * times — the 80 GB spill the round-10 sf1 sweep hit. Materialized,
    * each level is computed once and the oracle is sf1-feasible.
    */
  private def pagerankOracleSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val head =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 30),
        |ce AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce),
        |nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |outdeg AS MATERIALIZED (SELECT u, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY u),
        |ew AS MATERIALIZED (SELECT e.u, e.v, CAST(1 AS DOUBLE) / d.deg AS w
        |  FROM e JOIN outdeg d ON e.u = d.u),
        |r0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (SELECT ew.v AS node, sum(r.rank * ew.w) AS contrib
         |  FROM ew JOIN r${k - 1} r ON ew.u = r.node GROUP BY ew.v),
         |dg$k AS MATERIALIZED (SELECT COALESCE(sum(r.rank), CAST(0 AS DOUBLE)) AS m
         |  FROM r${k - 1} r LEFT JOIN outdeg d ON r.node = d.u WHERE d.u IS NULL),
         |r$k AS MATERIALIZED (SELECT n.node,
         |    (1 - $d) / nn.n + $d * (COALESCE(c.contrib, CAST(0 AS DOUBLE)) + dg.m / nn.n) AS rank
         |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node, dg$k dg, nn)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 6) AS rank FROM r$iters" +
      "\nORDER BY rank DESC, node ASC LIMIT 20"
  }

  /** Unrolled personalized-PageRank oracle: [[pagerankOracleSql]] with
    * the restart and dangling teleport directed at the 5%-hash seed set
    * (and the same MATERIALIZED-per-CTE memory bound).
    */
  private def pprOracleSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val head =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 30),
        |ce AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce),
        |nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
        |sf AS MATERIALIZED (SELECT node,
        |    CASE WHEN CAST(concat('0x', substring(md5(CAST(node AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100 < 5 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS s
        |  FROM nodes),
        |ns AS MATERIALIZED (SELECT CAST(sum(s) AS DOUBLE) AS k FROM sf),
        |outdeg AS MATERIALIZED (SELECT u, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY u),
        |ew AS MATERIALIZED (SELECT e.u, e.v, CAST(1 AS DOUBLE) / d.deg AS w
        |  FROM e JOIN outdeg d ON e.u = d.u),
        |r0 AS MATERIALIZED (SELECT node, s / ns.k AS rank FROM sf, ns)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (SELECT ew.v AS node, sum(r.rank * ew.w) AS contrib
         |  FROM ew JOIN r${k - 1} r ON ew.u = r.node GROUP BY ew.v),
         |dg$k AS MATERIALIZED (SELECT COALESCE(sum(r.rank), CAST(0 AS DOUBLE)) AS m
         |  FROM r${k - 1} r LEFT JOIN outdeg d ON r.node = d.u WHERE d.u IS NULL),
         |r$k AS MATERIALIZED (SELECT n.node,
         |    (1 - $d) * n.s / ns.k + $d * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
         |      + dg.m * n.s / ns.k) AS rank
         |  FROM sf n LEFT JOIN c$k c ON n.node = c.node, dg$k dg, ns)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 6) AS rank FROM r$iters" +
      "\nORDER BY rank DESC, node ASC LIMIT 20"
  }

  /** Unrolled k-core peeling oracle: same subgraph head, `rounds`
    * induction steps of (degree → keep-set → semi-join re-induction).
    */
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 30),
        |ce AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e0 AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT u FROM e${r - 1} GROUP BY u HAVING count(*) >= $k),
         |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
         |  JOIN k$r a ON e.u = a.u JOIN k$r b ON e.v = b.u)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT u AS node, CAST(count(*) AS BIGINT) AS deg" +
      s"\nFROM e$rounds GROUP BY u"
  }

  /** Unrolled label-propagation oracle: same subgraph head; each round
    * replays the engine's (count desc, label asc) argmax as a
    * row_number window over the (node, label) neighbor-label counts.
    */
  private def lpaOracleSql(rounds: Int): String = {
    val head =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 30),
        |ce AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce),
        |nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
        |l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""l$k AS MATERIALIZED (SELECT node, label FROM (
         |  SELECT e.v AS node, r.label,
         |    row_number() OVER (PARTITION BY e.v
         |      ORDER BY count(*) DESC, r.label ASC) AS rn
         |  FROM e JOIN l${k - 1} r ON e.u = r.node
         |  GROUP BY e.v, r.label) t WHERE rn = 1)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, label FROM l$rounds"
  }

  /** Item-item cosine oracle: plain relational replay — the √/÷ chain is
    * the identical correctly-rounded IEEE sequence in both engines.
    */
  private val itemCfOracleSql: String =
    """WITH bi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |ni AS MATERIALIZED (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i),
      |cooc AS MATERIALIZED (SELECT a.i AS u, b.i AS v, CAST(count(*) AS BIGINT) AS cooc
      |  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT c.u, c.v, c.cooc, nu.n AS n_u, nv.n AS n_v,
      |  round(CAST(c.cooc AS DOUBLE) /
      |    sqrt(CAST(nu.n AS DOUBLE) * CAST(nv.n AS DOUBLE)), 6) AS cosine
      |FROM cooc c JOIN ni nu ON c.u = nu.i JOIN ni nv ON c.v = nv.i
      |ORDER BY cosine DESC, u ASC, v ASC LIMIT 20""".stripMargin

  /** Same sampled co-purchase subgraph as the PageRank oracle; the AA
    * weights route through the identical round12-decimal path as the
    * engine so pair sums are bit-equal.
    */
  private def adamicAdarOracleSql(maxDegree: Option[Long] = None): String =
    s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
      |    AS BIGINT) % 100 < 30),
      |ce AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |e AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce),
      |deg AS MATERIALIZED (SELECT u AS w, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u),
      |ew AS MATERIALIZED (SELECT e.v AS n, e.u AS w,
      |    CAST(CAST(round(CAST(1 AS DOUBLE) / ln(CAST(greatest(deg, 2) AS DOUBLE)), 12)
      |      AS DECIMAL(38,12)) * 1000000000000 AS HUGEINT) AS aw
      |  FROM e JOIN deg ON e.u = deg.w${
          maxDegree.fold("")(cap => s" WHERE deg <= $cap")}),
      |pr AS MATERIALIZED (SELECT a.n AS u, b.n AS v, a.aw
      |  FROM ew a JOIN ew b ON a.w = b.w AND a.n < b.n),
      |np AS MATERIALIZED (SELECT * FROM pr p
      |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = p.u AND e.v = p.v))
      |SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
      |  round(CAST(SUM(aw) AS DOUBLE) / CAST(1000000000000 AS DOUBLE), 6) AS aa
      |FROM np GROUP BY u, v
      |ORDER BY aa DESC, u ASC, v ASC LIMIT 20""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // Tolerance contracts: exact values + flags asserted TRUE — a sketch
    // outside its guarantee flips a flag and fails the hash gate.
    "q_kll_served" ->
      """WITH n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type)
        |SELECT event_type, p, n, TRUE AS rank_ok
        |FROM n CROSS JOIN (SELECT unnest([CAST(0.5 AS DOUBLE),
        |  CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS p) ps""".stripMargin,

    "q_theta_served" ->
      """WITH d1 AS (SELECT CAST(MIN(ts) AS DATE) AS d FROM events),
        |f AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click'
        |      AND (CAST(ts AS DATE) = d OR CAST(ts AS DATE) = d + 1)
        |      THEN 1 ELSE 0 END) AS in_a,
        |    MAX(CASE WHEN event_type = 'purchase'
        |      AND CAST(ts AS DATE) = d + 1 THEN 1 ELSE 0 END) AS in_b
        |  FROM events CROSS JOIN d1 GROUP BY user_id)
        |SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
        |  CAST(SUM(in_b) AS BIGINT) AS n_b,
        |  CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
        |  CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_only_a,
        |  TRUE AS approx_ok
        |FROM f""".stripMargin,

    "q_topk_served" ->
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id),
        |t AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 5)
        |SELECT user_id, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS BIGINT) AS rnk,
        |  TRUE AS served_ok
        |FROM t""".stripMargin,

    "q_dq_checks" ->
      """WITH om AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nulls,
        |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS ndv,
        |    MIN(o_totalprice) AS minp,
        |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS indom
        |  FROM orders),
        |ri AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
        |    CAST(COUNT(o.o_orderkey) AS DOUBLE) AS matched
        |  FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey)
        |SELECT 'orders.o_custkey.completeness' AS "check",
        |  round(1.0 - nulls / cnt, 6) AS metric, nulls = 0.0 AS passed FROM om
        |UNION ALL SELECT 'orders.o_orderkey.uniqueness',
        |  round(ndv / cnt, 6), ndv = cnt FROM om
        |UNION ALL SELECT 'orders.o_totalprice.min_positive',
        |  round(minp, 6), minp > 0.0 FROM om
        |UNION ALL SELECT 'orders.o_orderstatus.domain',
        |  round(indom / cnt, 6), indom = cnt FROM om
        |UNION ALL SELECT 'lineitem.l_orderkey.ref_integrity',
        |  round(matched / cnt, 6), matched = cnt FROM ri""".stripMargin,

    "q_hll_served" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,

    "q_psi_drift" ->
      """WITH b AS (SELECT LEAST(CAST(FLOOR(n_chars / 200) AS BIGINT), 9) AS bin,
        |    doc_id % 2 = 0 AS is_ref FROM documents),
        |r AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_ref FROM b WHERE is_ref GROUP BY bin),
        |c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_cur FROM b WHERE NOT is_ref GROUP BY bin),
        |j AS (SELECT COALESCE(r.bin, c.bin) AS bin,
        |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |  FROM r FULL OUTER JOIN c ON r.bin = c.bin),
        |t AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr, CAST(SUM(n_cur) AS DOUBLE) AS tc FROM j)
        |SELECT bin, n_ref, n_cur,
        |  round(GREATEST(n_ref / tr, 1e-6), 6) AS p_ref,
        |  round(GREATEST(n_cur / tc, 1e-6), 6) AS p_cur,
        |  round((GREATEST(n_ref / tr, 1e-6) - GREATEST(n_cur / tc, 1e-6))
        |    * ln(GREATEST(n_ref / tr, 1e-6) / GREATEST(n_cur / tc, 1e-6)), 6) AS psi_term
        |FROM j CROSS JOIN t""".stripMargin,

    "q_skew_audit" ->
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM events GROUP BY user_id),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM events),
        |topk AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 10)
        |SELECT user_id, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS BIGINT) AS rnk,
        |  round(n / t, 6) AS share
        |FROM topk CROSS JOIN tot""".stripMargin,

    "q_table_stats" ->
      """SELECT 'l_orderkey' AS "column", CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_str, CAST(MAX(l_orderkey) AS VARCHAR) AS max_str
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
        |FROM lineitem""".stripMargin,

    // quantile_cont == Spark's exact `percentile` (both R-7 linear
    // interpolation); the sketch flag is asserted TRUE (tolerance
    // contract — a broken sketch flips the flag and fails the hash gate).
    "q_approx_quantiles" -> Seq(0.5, 0.9, 0.99).map(p =>
      s"""SELECT CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(n_chars, $p), 6) AS exact_value,
         |  TRUE AS within_tol
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n"),

    "q_winsorize" ->
      """WITH p AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    round(quantile_cont(value, 0.05), 6) AS plo,
        |    round(quantile_cont(value, 0.95), 6) AS phi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, MAX(p.n) AS n,
        |  MAX(p.plo) AS p_lo, MAX(p.phi) AS p_hi,
        |  CAST(SUM(CASE WHEN e.value < p.plo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN e.value > p.phi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi
        |FROM events e JOIN p USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    "q_regression" ->
      """WITH x AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS x
        |  FROM events),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    SUM(y) AS sy, SUM(x * y) AS sxy
        |  FROM x GROUP BY user_id),
        |d AS (SELECT user_id, n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd
        |  FROM a)
        |SELECT user_id, n,
        |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
        |  round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
        |    / nd, 6) AS intercept
        |FROM d WHERE n >= 2 AND (nd * sxxd - sxd * sxd) > 0.0""".stripMargin,

    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 30),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT ab.u, ab.v, bc.v AS w FROM e ab JOIN e bc ON ab.v = bc.u
        |  WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.u = ab.u AND ac.v = bc.v))
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([u, v, w]) AS node FROM tri)
        |GROUP BY node ORDER BY n_triangles DESC, node ASC LIMIT 20""".stripMargin,

    "q_pagerank" -> pagerankOracleSql(5),

    "q_adamic_adar" -> adamicAdarOracleSql(),
    "q_adamic_adar_capped" -> adamicAdarOracleSql(maxDegree = Some(40L)),

    "q_gini" ->
      """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM s)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(x) AS BIGINT) AS total,
        |  round(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE) /
        |    CAST(count(*) * sum(x) AS DOUBLE), 6) AS gini
        |FROM r""".stripMargin,

    "q_ppr" -> pprOracleSql(5),

    "q_kcore" -> kCoreOracleSql(3, 4),
    "q_lpa" -> lpaOracleSql(4),
    "q_item_cf" -> itemCfOracleSql,

    // ln/ln(10) replays Spark's log(10, x) lowering exactly; digit by
    // string on the integer part — no log10 boundary risk.
    "q_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM lineitem WHERE l_extendedprice >= 1),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        |t AS (SELECT *, CAST(SUM(n) OVER () AS DOUBLE) AS tot,
        |    ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE))
        |      / ln(CAST(10 AS DOUBLE)) AS e FROM c)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / tot, 6) AS freq,
        |  round(e, 6) AS expected,
        |  round(power(CAST(n AS DOUBLE) - tot * e, 2) / (tot * e), 6) AS chi2
        |FROM t""".stripMargin
  )
}
