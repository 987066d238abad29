package graft.queries

import graft.layout.{BucketStore, Compaction, PartitionedStore, ZOrder}
import graft.operators.Relational
import graft.util.{Num, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core relational operator coverage (SURVEY.md §2.2–§2.8) over the driver
  * test tables, each with a DuckDB oracle.
  *
  * Conventions for oracle parity:
  *  - double sums go through DECIMAL(18,2) (see [[graft.util.Num]]);
  *  - every ORDER BY used under a LIMIT is a total order (unique tiebreaker);
  *  - oracle SQL explicitly casts to the type Spark naturally produces
  *    (DuckDB `count`/`length`/`year` are BIGINT, `sum(int)` is HUGEINT).
  */
object CoreQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // Aggregations (SURVEY §2.4). TPC-H Q1 shape: the reference's
    // group-count audit (`Tweets_preprocessing.py:457,470`) generalized.
    "q_agg_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Num.sumd(col("l_quantity")).as("sum_qty"),
          Num.sumd(col("l_extendedprice")).as("sum_base_price"),
          // decimal arithmetic end-to-end: a per-row double product would
          // land on round-half boundaries where Spark (HALF_UP) and DuckDB
          // disagree; decimal × decimal is exact.
          sum(Num.dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (Num.sumd(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          Num.cnt.as("count_order"))
    }),

    // Filter + projection with parquet pushdown (SURVEY §2.2): predicate and
    // column pruning must reach the scan.
    "q_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1997-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp"))
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
    }),

    // HAVING over group counts — the reference's duplicate audit
    // (`Tweets_preprocessing.py:457,470`) on orders-per-customer.
    "q_having" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(Num.cnt.as("n_orders"), Num.sumd(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") > 14)
    }),

    // Incremental MV maintenance: base-partition aggregate state merged
    // with the new-batch state == full recompute (the oracle recomputes
    // from scratch; decimal sums make the merge exact). At scale the MV is
    // persisted bucketed by key and only the batch is scanned per advance.
    "q_mv_merge" -> ((s, dir) => {
      import graft.operators.Materialize
      val orders = Tables.orders(s, dir)
      val mv = Materialize.aggState(
        orders.filter(col("o_orderkey") % 5 =!= 0),
        Seq("o_orderpriority"), "o_totalprice")
      val batch = Materialize.aggState(
        orders.filter(col("o_orderkey") % 5 === 0),
        Seq("o_orderpriority"), "o_totalprice")
      Materialize.serve(Materialize.merge(mv, batch, Seq("o_orderpriority")),
        Seq("o_orderpriority"))
    }),

    // Min/max/count-distinct stats per event type.
    "q_agg_stats" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          Num.cnt.as("n"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          Num.sumd(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // ROLLUP / CUBE (engine built-ins beyond the reference's surface).
    "q_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.cnt.as("n"), Num.sumd(col("l_quantity")).as("sum_qty"))
    }),
    // Explicit GROUPING SETS (beyond rollup/cube's fixed lattices): the
    // (flag, status) + (flag) + () subset, via the SQL surface.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |""".stripMargin)
    }),
    "q_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(Num.cnt.as("n"))
    }),

    // Skew-resistant two-phase (salted) aggregation — identical results to
    // a direct groupBy for algebraic aggregates, verified by the plain
    // GROUP BY oracle; at scale a hot key spreads over the salt buckets.
    "q_salted_agg" -> ((s, dir) =>
      Relational.saltedAgg(Tables.events(s, dir), col("event_type"), saltBuckets = 8,
        partials = Seq(count(lit(1)).as("pc"), sum(Num.dec2(col("value"))).as("ps")),
        merge = Seq(sum(col("pc")).cast("long").as("n"),
          sum(col("ps")).cast("double").as("sum_value")))),

    // Skew-resistant salted JOIN (the join-side companion to q_salted_agg):
    // fact rows salted, dim exploded × salt range; result is salt-invariant
    // so the plain-join oracle must hash-match exactly. The dim carries a
    // shuffle_hash hint — at bench scale Spark would broadcast it, and a
    // broadcast join never shuffles the fact side by key, which would make
    // the salt a no-op: the hint forces the shuffled plan the operator
    // exists for (PlanHealthSpec guards it stays that way).
    "q_salted_join" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        .hint("shuffle_hash")
      Relational.saltedJoin(Tables.events(s, dir), dim, "user_id", saltBuckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(Num.dec2(col("value"))).cast("double").as("sum_value"))
    }),

    // ------------------------------------------------------------------
    // Joins (SURVEY §2.3). Star join with broadcast dims: nation/region are
    // tiny → broadcast hash join, single shuffle on o_custkey=c_custkey.
    "q_join_star" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(Num.cnt.as("n_orders"), Num.sumd(col("o_totalprice")).as("revenue"))
    }),

    // FK detail join, row-level output (tweet→user point-lookup join shape,
    // `SolrRanker.java:58-64`, as one relational join instead of N+1 lookups).
    "q_join_detail" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_acctbal"), col("o_totalprice"))
    }),

    // Semi join — reference's collected-id `isin` filter
    // (`Tweets_preprocessing.py:234`) as a real left_semi.
    "q_semi_join" -> ((s, dir) => {
      val keys = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("o_custkey"))
      Relational.semiJoin(Tables.orders(s, dir), keys, Seq("o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    }),

    // Anti join — reference's `~isin` sensitive-id exclusion
    // (`Tweets_preprocessing.py:115,147`).
    "q_anti_join" -> ((s, dir) => {
      val keys = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
      Relational.antiJoin(Tables.customer(s, dir), keys, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Left outer join, row-level with null extension: every customer, with
    // their big orders where they exist — the null-extended side is part of
    // the hash-checked output.
    "q_outer_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > lit(350000.0))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
    }),

    // As-of join: each purchase matched to the user's latest preceding (or
    // simultaneous) click. DuckDB's native ASOF JOIN is the oracle for our
    // union+window composition.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = Relational.dedupKeepFirst(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id")),
        key = Seq(col("user_id"), col("ts")),
        order = Seq(col("event_id").desc))
        .withColumnRenamed("event_id", "click_id")
      Relational.asofJoin(purchases, clicks, "user_id", "ts",
        leftCols = Seq("event_id", "value"), rightPayload = "click_id")
    }),

    // The SAME as-of join through the engine's native Catalyst operator
    // (custom LogicalPlan + Strategy + merge-sweep SparkPlan,
    // graft.plans.AsofNative): two independent co-partitioning exchanges
    // + per-partition O(1)-state merge instead of the union+window's
    // combined-stream sort. Hash-equal to q_asof_join's oracle.
    "q_asof_native" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      // run-aligned dedup: planned on the PARENT user_id partitioning, so
      // the native exec's ClusteredDistribution(user_id) reuses this
      // exchange — the right side shuffles ONCE end-to-end
      val clicks = Relational.dedupKeepFirstRuns(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id")),
        parentKey = Seq(col("user_id")), runKey = col("ts"),
        order = Seq(col("event_id").desc))
        .withColumnRenamed("event_id", "click_id")
      graft.plans.AsofNative.join(purchases, clicks, "user_id", "ts",
        leftCols = Seq("event_id", "value"), payload = "click_id")
    }),

    // GDPR purge pre-flight: rows each table would lose when forgetting
    // customers with custkey % 131 = 0 — lineitem cascades through orders.
    "q_purge_audit" -> ((s, dir) => {
      val forget = Tables.customer(s, dir)
        .filter(col("c_custkey") % 131 === 0).select(col("c_custkey"))
      val orderKeys = Tables.orders(s, dir)
        .join(forget.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "left_semi")
        .select(col("o_orderkey").as("l_orderkey"))
      Relational.purgeAudit(Seq(
        ("customer", Tables.customer(s, dir),
          forget, Seq("c_custkey")),
        ("orders", Tables.orders(s, dir),
          forget.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey")),
        ("lineitem", Tables.lineitem(s, dir), orderKeys, Seq("l_orderkey"))))
    }),

    // SCD2 dimension build: per user, event_type change history → validity
    // intervals (consecutive same-value runs collapsed, last row current).
    "q_scd2" -> ((s, dir) => {
      // run-aligned dedup: same answer as dedupKeepFirst on (user_id, ts),
      // but planned on user_id alone so scd2's windows reuse the exchange
      // (PlanHealthSpec asserts the whole chain is ONE hash exchange)
      val ev = Relational.dedupKeepFirstRuns(
        Tables.events(s, dir).select(col("user_id"), col("ts"),
          col("event_type"), col("event_id")),
        parentKey = Seq(col("user_id")), runKey = col("ts"),
        order = Seq(col("event_id").desc)).drop("event_id")
      Relational.scd2(ev, "user_id", "ts", "event_type")
    }),

    // Forward as-of: each purchase matched to the user's NEXT click at or
    // after it — same one-shuffle window plan on reversed time.
    "q_asof_fwd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = Relational.dedupKeepFirst(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id")),
        key = Seq(col("user_id"), col("ts")),
        order = Seq(col("event_id").desc))
        .withColumnRenamed("event_id", "click_id")
      Relational.asofJoin(purchases, clicks, "user_id", "ts",
        leftCols = Seq("event_id", "value"), rightPayload = "click_id",
        forward = true)
    }),

    // ------------------------------------------------------------------
    // Window functions (SURVEY §2.5). Keep-latest-per-key: the reference's
    // sort+drop_duplicates (`Tweets_preprocessing.py:156-157`) and HashMap
    // upsert (`SolrIndexer.java:25-45`) made deterministic.
    "q_window_dedup" -> ((s, dir) => {
      Relational.dedupKeepFirst(
        Tables.orders(s, dir),
        key = Seq(col("o_custkey")),
        order = Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    }),

    // Ranking top-k per group.
    "q_window_rank" -> ((s, dir) => {
      Relational.topKPerGroup(
        Tables.orders(s, dir),
        key = Seq(col("o_orderpriority")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Running + frame-bounded sums (decimal — order-independent).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("running_spend",
          sum(Num.dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("mov3_spend",
          sum(Num.dec2(col("o_totalprice")))
            .over(w.rowsBetween(-2, Window.currentRow)).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_spend"), col("mov3_spend"))
    }),

    // lag/lead — inter-order gap per customer in days.
    // Value-based RANGE frame (vs the ROWS frames above): peers within
    // 1000.0 of the current price count toward the frame regardless of row
    // position — deterministic under ties by construction (value-defined
    // frame), so no tiebreaker column is needed for parity.
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 0L)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          count(lit(1)).over(w).cast("long").as("n_within_1000"))
    }),
    // Exact grouped quantiles — per-type latency-percentile style rollup
    // (Spark's exact `percentile` == DuckDB quantile_cont, both R-7).
    "q_group_quantiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type")).agg(
        count(lit(1)).cast("long").as("n"),
        round(expr("percentile(value, 0.5D)"), 6).as("p50"),
        round(expr("percentile(value, 0.9D)"), 6).as("p90"),
        round(expr("percentile(value, 0.99D)"), 6).as("p99"))),

    // Fixed-width histogram binning — the profiling companion to
    // quantiles; one combinable groupBy over computed buckets.
    "q_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(floor(col("value") / 50.0).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n"))),

    // Union-by-name with missing-column null fill — schema-evolution
    // unions (Spark unionByName(allowMissingColumns) == DuckDB
    // UNION ALL BY NAME).
    "q_union_by_name" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"), col("source"), col("n_chars"))
        .unionByName(
          d.filter(col("doc_id") < 100)
            .select(col("doc_id"), col("lang"), col("source")),
          allowMissingColumns = true)
    }),

    // Distribution windows: ntile quartiles + percent_rank/cume_dist, tie
    // broken by event_id so relative positions are engine-independent.
    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, dir).select(
        col("event_id"), col("event_type"), col("value"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
    }),

    // FULL OUTER join with genuine null extension on both sides: per-source
    // doc counts against a small tag table containing a source with no docs.
    "q_full_outer" -> ((s, dir) => {
      import s.implicits._
      val tags = Seq(("src0", "alpha"), ("src1", "beta"), ("srcX", "ghost"))
        .toDF("source", "tag")
      Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).cast("long").as("n_docs"))
        .join(tags, Seq("source"), "full_outer")
        .select(col("source"), col("n_docs"), col("tag"))
    }),

    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("gap_days"))
    }),

    // Bucketized range join: purchases within 1 hour after an error by the
    // same user. Oracle is the plain inequality join.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("err_end"),
          col("event_id").as("err_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      Relational.rangeJoinBucketed(purchases, errors, "user_id",
          ts = "ts", start = "err_ts", end = "err_end", bucketSeconds = 3600)
        .select(col("user_id"), col("err_id"), col("purchase_id"), col("ts"))
    }),

    // Exact interpolated quantiles (continuous): Spark percentile ==
    // DuckDB quantile_cont, both linear interpolation.
    "q_quantiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("med"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))),

    // Pivot (wide counts per hour × event type) with explicit values and
    // zero-fill so the shape is engine-independent.
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, dir)
        .groupBy(hour(col("ts")).as("h"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      pivoted.select(col("h") +: types.map(t =>
        coalesce(col(t), lit(0L)).cast("long").as(t)): _*)
    }),

    // Unpivot / melt: lineitem measures to long form.
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "val")),

    // ------------------------------------------------------------------
    // Sorts / limits / pagination (SURVEY §2.6).
    "q_topk_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    "q_sort_multi" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .orderBy(col("l_orderkey").asc, col("l_shipdate").desc, col("l_linenumber").asc)
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
    }),

    // Server-side pagination the reference UI asks for but never gets
    // (`search-engine.component.ts:38` vs `api/Handler.java:34`).
    "q_pagination" -> ((s, dir) => {
      Relational.page(Tables.orders(s, dir), Seq(col("o_orderkey").asc), skip = 100, limit = 20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Keyset (cursor) pagination — the deep-paging shape q_pagination's
    // OFFSET cannot scale to: the cursor predicate reaches the parquet
    // scan (PushedFilters), so page depth costs nothing.
    "q_keyset_page" -> ((s, dir) => {
      Relational.keysetPage(Tables.orders(s, dir), col("o_orderkey"), lit(500L), limit = 20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // The reference's one SQL entry point (`Word_cloud_evaluation.ipynb`
    // cell 4): CREATE TEMPORARY VIEW ... USING parquet, then SELECT.
    "q_sql_view" -> ((s, dir) => {
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW docs_view " +
        s"USING parquet OPTIONS (path '$dir/documents.parquet')")
      s.sql("SELECT doc_id, lang, n_chars FROM docs_view WHERE n_chars > 300")
    }),

    // Correlated scalar subquery through the SQL parser (decimal-routed avg
    // for engine determinism).
    "q_corr_subquery" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
          |WHERE o_totalprice > 2 * (
          |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          |  FROM orders_v i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // LATERAL correlated subquery (top-2 orders per qualifying customer) —
    // the SQL-standard per-row derived table. Catalyst decorrelates the
    // ORDER BY + LIMIT into one partitioned window, so the plan is the
    // rank-filter shape, not a nested loop.
    "q_lateral" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_lat")
      Tables.orders(s, dir).createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer_lat c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
          |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
    }),

    // Modern ANSI aggregates in one grouped pass: mode() (unique max by
    // construction in this data — verified tie-free at every SF),
    // percentile_disc WITHIN GROUP (the discrete order statistic: first
    // value whose cume_dist reaches p), and listagg DISTINCT WITHIN GROUP.
    "q_agg_modern" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_mod")
      s.sql(
        """SELECT l_returnflag,
          |  mode(l_linestatus) AS mode_status,
          |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25_disc,
          |  listagg(DISTINCT l_linestatus, ',')
          |    WITHIN GROUP (ORDER BY l_linestatus) AS statuses
          |FROM lineitem_mod GROUP BY l_returnflag""".stripMargin)
    }),

    // ------------------------------------------------------------------
    // Set operations (SURVEY §2.7).
    "q_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val b = o.filter(col("o_orderpriority") === "5-LOW" && col("o_totalprice") > 200000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      a.unionByName(b)
    }),

    "q_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val y1997 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      val y1998 = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
      y1997.intersect(y1998)
    }),

    "q_except" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      f.except(open)
    }),

    "q_distinct" -> ((s, dir) => {
      Tables.orders(s, dir).select(col("o_orderstatus"), col("o_orderpriority")).distinct()
    }),

    // ------------------------------------------------------------------
    // Scalar functions (SURVEY §2.8): regex/string munging mirroring the
    // reference's created_at cleanup (`Tweets_preprocessing.py:125-128`).
    "q_string_funcs" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
        upper(substring(col("text"), 1, 20)).as("head20"),
        length(col("text")).cast("long").as("n_chars_txt"),
        regexp_replace(col("text"), "spark", "SPARK").as("marked"),
        ltrim(lower(col("text"))).as("lowered"))
    }),

    // Timestamp munging: format→parse round trip with the reference's
    // 'MMM dd HH:mm:ss yyyy' pattern (`Tweets_preprocessing.py:128,455`).
    "q_timestamp_parse" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        date_format(col("ts"), "MMM dd HH:mm:ss yyyy").as("formatted"))
        .withColumn("parsed", to_timestamp(col("formatted"), "MMM dd HH:mm:ss yyyy"))
    }),

    // Date part extraction + truncation.
    "q_date_parts" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        date_trunc("day", col("ts")).as("day_ts"),
        unix_millis(col("ts")).as("epoch_ms"))
    }),

    // JSON extraction (events.props is a JSON string).
    "q_json_extract" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
    }),

    // Regex predicate — the reference's hiring-tweet rlike filter
    // (`Tweets_preprocessing.py:475-481`) over documents.text.
    "q_regex_filter" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(lower(col("text")).rlike("(spark|stream) (query|filter|join)"))
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // MERGE-style CDC apply: snapshot = latest state per user before
    // Jan 16; changes = the later events, errors acting as tombstones.
    // Last writer wins per user; surviving rows keep their provenance op.
    "q_cdc_apply" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-16").cast("timestamp")
      val snapshot = Relational.dedupKeepFirst(
          ev.filter(col("ts") < cut), Seq(col("user_id")),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val changes = ev.filter(col("ts") >= cut)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"))
      Relational.cdcApply(snapshot, changes, Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("op"), col("event_id"),
          round(col("value"), 6).as("value"))
    }),

    // Changelog net-effect compaction: each user's post-cut change run
    // collapsed to the one change with the same end effect (created-
    // and-deleted-in-batch vanishes; I+U* → I; existing-key runs → one
    // U or D). The sortable (micros, id) version key makes first/last
    // engine-deterministic. Downstream CDC apply then touches each key
    // once, not once per change.
    "q_cdc_net" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-16").cast("timestamp")
      val pre = ev.filter(col("ts") < cut).select(col("user_id")).distinct()
        .withColumn("__seen", lit(1))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val post = ev.filter(col("ts") >= cut)
        .withColumn("ver", concat(
          lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0")))
        .join(pre, Seq("user_id"), "left")
        .withColumn("__rn", row_number().over(w))
        .withColumn("op",
          when(col("__seen").isNull && col("__rn") === 1, "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U"))
        .withColumn("value", round(col("value"), 6))
      Relational.cdcNetEffect(post, "user_id", "ver", "op", "value")
    }),

    // Snapshot diff (CDF generation, the inverse of q_cdc_apply): the
    // changelog that transforms the pre-cut latest-state snapshot into
    // the current one — I/U rows only here (every before-user still
    // exists in after). Values pre-rounded so the null-safe compare is
    // engine-exact.
    "q_snapshot_diff" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-16").cast("timestamp")
      def latest(df: DataFrame): DataFrame =
        Relational.dedupKeepFirst(df, Seq(col("user_id")),
            Seq(col("ts").desc, col("event_id").desc))
          .select(col("user_id"), round(col("value"), 6).as("value"))
      Relational.snapshotDiff(latest(ev.filter(col("ts") < cut)), latest(ev),
        Seq("user_id"), Seq("value"))
    }),

    // Z-order vs 1-D clustering: file-skipping audit for a 2-D box
    // predicate (customer 100–300 × order-date 1996) over 64 files.
    // Morton layout bounds BOTH dims per file; each linear layout prunes
    // only its own dim.
    "q_zorder" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_custkey").cast("long").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("dy"))
      ZOrder.skippingAudit(o, "ck", "dy", nFiles = 64,
        xLo = 100, xHi = 300, yLo = 1461, yHi = 1825)
    }),

    // TPC-H Q5 shape — regional supplier revenue: the 6-table snowflake
    // with the LOCAL-supplier condition (c_nationkey = s_nationkey,
    // which prunes most join output) and a year + region filter. All
    // four dimension legs broadcast; lineitem⋈orders is the only big
    // join; the date filter is pushed to the orders scan.
    "q_regional_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(Num.dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q3 shape — shipping priority: top unshipped-revenue orders
    // for one market segment before a cutoff. Broadcast customer leg,
    // one big join, TakeOrdered top-10.
    "q_ship_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-07-01").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(Num.dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Pearson correlation matrix over the lineitem numerics in ONE
    // pass: every moment (sums, squares, cross products) is an exact
    // decimal aggregate, so the correlation chain is the same IEEE ops
    // on identical inputs in both engines — the deterministic answer to
    // corr()'s partition-order-dependent streaming covariance.
    "q_corr" -> ((s, dir) => {
      def d(c: String) = Num.dec2(col(c))
      val m = Tables.lineitem(s, dir).agg(
        count(lit(1)).cast("double").as("n"),
        sum(d("l_quantity")).cast("double").as("sq"),
        sum(d("l_extendedprice")).cast("double").as("sp"),
        sum(d("l_discount")).cast("double").as("sd"),
        sum(d("l_quantity") * d("l_quantity")).cast("double").as("sqq"),
        sum(d("l_extendedprice") * d("l_extendedprice")).cast("double").as("spp"),
        sum(d("l_discount") * d("l_discount")).cast("double").as("sdd"),
        sum(d("l_quantity") * d("l_extendedprice")).cast("double").as("sqp"),
        sum(d("l_quantity") * d("l_discount")).cast("double").as("sqd"),
        sum(d("l_extendedprice") * d("l_discount")).cast("double").as("spd"))
      def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        round((col("n") * col(sxy) - col(sx) * col(sy)) /
          (sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
            sqrt(col("n") * col(syy) - col(sy) * col(sy))), 6)
      m.select(col("n").cast("long").as("n"),
        r("sqp", "sq", "sp", "sqq", "spp").as("corr_qty_price"),
        r("sqd", "sq", "sd", "sqq", "sdd").as("corr_qty_disc"),
        r("spd", "sp", "sd", "spp", "sdd").as("corr_price_disc"))
    }),

    // TPC-H Q13 shape — order-count distribution over customers
    // INCLUDING the zero-order ones (the left outer join is the point:
    // an inner join silently drops the empty bucket): per customer
    // count, then the histogram of those counts.
    "q_customer_distribution" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      val o = Tables.orders(s, dir).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(Num.cnt.as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape — top supplier(s) by shipped revenue, selected
    // with a scalar subquery against the same derived view (ties kept,
    // which a LIMIT 1 would silently break).
    "q_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(Num.dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
          .cast("double").as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("__m"))
      rev.join(broadcast(top), col("total_revenue") === col("__m"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 6).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q14 shape — promo revenue share: conditional numerator over
    // a broadcast part join, exact decimal sums, ONE final division.
    "q_promo_share" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"),
            Num.dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("__promo"),
          sum(Num.dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
            .as("__total"))
        .select(
          col("__promo").cast("double").as("promo_revenue"),
          col("__total").cast("double").as("total_revenue"),
          round(lit(100.0) * col("__promo").cast("double") /
            col("__total").cast("double"), 6).as("promo_share_pct"))
    }),

    // Dynamic partition pruning: the partitioned fact joined to a
    // FILTERED dimension — the partition values to read are only known
    // at runtime (from the dimension's broadcast), yet the fact scan
    // prunes directories via DynamicPruningExpression (PlanHealthSpec).
    // No literal bucket appears anywhere in the query.
    "q_dpp" -> ((s, dir) => {
      val o = PartitionedStore.orders(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey").cast("int").as("r_key"), col("r_name"))
      o.join(broadcast(r), o("o_bucket") === col("r_key"))
        .groupBy(col("r_name"))
        .agg(Num.cnt.as("n_orders"),
          Num.sumd(col("o_totalprice")).as("total"))
    }),

    // Small-files compaction audit: a 16-file fragmented copy of
    // documents rewritten into 4 range-sorted files; file counts are
    // observed IN-PLAN via input_file_name() and the row/checksum pair
    // proves the rewrite lost nothing. Oracle pins the contract.
    "q_compaction" -> ((s, dir) => Compaction.audit(s, dir)),

    // Bucketed co-located join: orders and lineitem pre-bucketed on the
    // join key ([[graft.layout.BucketStore]]) — the orderkey join AND the
    // orderkey aggregation both run with ZERO pre-join/pre-agg exchanges
    // (bucketing proves the partitioning; PlanHealthSpec asserts no
    // Exchange below the SortMergeJoin). The layout shuffle is paid once
    // and amortized over every orderkey query in the workload — the
    // 100 TB fact-table shape. Merge hint pins SMJ so the co-location
    // (not a broadcast) is what's exercised.
    "q_bucketed_join" -> ((s, dir) => {
      val (oTbl, lTbl) = BucketStore.ensureBuilt(s, dir)
      val o = s.table(oTbl)
      val l = s.table(lTbl)
      l.hint("merge")
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(
          sum(Num.dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - Num.dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          Num.cnt.as("n_lines"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // Bucket pruning: a point predicate on the bucket key reads 1-of-8
    // bucket FILES (SelectedBucketsCount in the scan — asserted in
    // PlanHealthSpec), the bucketed analogue of partition pruning. The
    // probe key is resolved driver-side to a literal (the serving-boundary
    // pattern of IvfStore) because static pruning needs a literal.
    "q_bucket_pruning" -> ((s, dir) => {
      val (oTbl, _) = BucketStore.ensureBuilt(s, dir)
      val minKey = Tables.orders(s, dir)
        .agg(min(col("o_orderkey"))).head().getLong(0)
      // the agg ON the bucket key keeps the scan bucketed (Spark's
      // DisableUnnecessaryBucketedScan would otherwise drop the layout
      // for a bare filter) — pruning + exchange-free agg together
      s.table(oTbl)
        .filter(col("o_orderkey") === lit(minKey))
        .groupBy(col("o_orderkey"))
        .agg(Num.cnt.as("n"), Num.sumd(col("o_totalprice")).as("total"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |  AND l_quantity > 45""".stripMargin,

    "q_mv_merge" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
        |  MIN(o_totalprice) AS min_val, MAX(o_totalprice) AS max_val,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_val
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 14""".stripMargin,

    "q_agg_stats" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(value) AS min_value, MAX(value) AS max_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q_salted_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_star" ->
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_join_detail" ->
      """SELECT o_orderkey, c_name, c_acctbal, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority = '1-URGENT' AND c_mktsegment = 'BUILDING'""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
        |ON c_custkey = o.o_custkey""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.user_id, p.ts, p.event_id, p.value, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    // the native operator must land on the identical result
    "q_asof_native" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.user_id, p.ts, p.event_id, p.value, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "q_purge_audit" ->
      """SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM customer WHERE c_custkey % 131 = 0
        |UNION ALL
        |SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
        |WHERE o_custkey % 131 = 0
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey % 131 = 0)""".stripMargin,

    "q_scd2" ->
      """WITH h AS (SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
        |  FROM events GROUP BY user_id, ts),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER w AS prev,
        |    (lag(ts) OVER w IS NULL) AS first
        |  FROM h WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
        |k AS (SELECT user_id, ts, event_type FROM m
        |  WHERE first OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER w2 AS valid_to,
        |  (lead(ts) OVER w2 IS NULL) AS is_current
        |FROM k WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC)""".stripMargin,

    "q_asof_fwd" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.user_id, p.ts, p.event_id, p.value, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts""".stripMargin,

    "q_window_dedup" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "q_window_rank" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_spend
        |FROM orders""".stripMargin,

    "q_window_range" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_1000
        |FROM orders""".stripMargin,

    "q_group_quantiles" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_union_by_name" ->
      """SELECT doc_id, source, n_chars FROM documents
        |UNION ALL BY NAME
        |SELECT doc_id, lang, source FROM documents WHERE doc_id < 100""".stripMargin,

    // Distribution windows: quartile bucketing + relative-position stats,
    // deterministic under the (value, event_id) total order.
    "q_window_ntile" ->
      """SELECT event_id, event_type, value,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""".stripMargin,

    "q_full_outer" ->
      """SELECT COALESCE(d.source, k.source) AS source, n_docs, tag
        |FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |      FROM documents GROUP BY source) d
        |FULL JOIN (VALUES ('src0','alpha'), ('src1','beta'), ('srcX','ghost'))
        |  AS k(source, tag)
        |ON d.source = k.source""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(date_diff('day',
        |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC),
        |    o_orderdate) AS BIGINT) AS gap_days
        |FROM orders""".stripMargin,

    "q_range_join" ->
      """SELECT p.user_id, e.event_id AS err_id, p.event_id AS purchase_id, p.ts
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR""".stripMargin,

    "q_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS med,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(hour(ts) AS INT) AS h,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY hour(ts)""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
        |ORDER BY l_orderkey ASC, l_shipdate DESC, l_linenumber ASC LIMIT 100""".stripMargin,

    "q_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 20 OFFSET 100""".stripMargin,

    "q_keyset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey > 500 ORDER BY o_orderkey ASC LIMIT 20""".stripMargin,

    "q_sql_view" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 300",

    "q_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "q_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin,

    // percentile_disc replayed as its ANSI definition (min value with
    // cume_dist >= p) so both engines compute the identical order
    // statistic; mode is tie-free in this data; listagg == string_agg.
    "q_agg_modern" ->
      """WITH cd AS (SELECT l_returnflag, l_quantity,
        |    cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
        |  FROM lineitem),
        |pd AS (SELECT l_returnflag, MIN(l_quantity) AS q25_disc
        |  FROM cd WHERE cd >= 0.25 GROUP BY l_returnflag)
        |SELECT li.l_returnflag,
        |  mode(li.l_linestatus) AS mode_status,
        |  MAX(pd.q25_disc) AS q25_disc,
        |  string_agg(DISTINCT li.l_linestatus, ',' ORDER BY li.l_linestatus)
        |    AS statuses
        |FROM lineitem li JOIN pd ON li.l_returnflag = pd.l_returnflag
        |GROUP BY li.l_returnflag""".stripMargin,

    "q_union" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority = '5-LOW' AND o_totalprice > 200000""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_string_funcs" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^(\w+)', 1) AS first_word,
        |  upper(substring(text, 1, 20)) AS head20,
        |  CAST(length(text) AS BIGINT) AS n_chars_txt,
        |  regexp_replace(text, 'spark', 'SPARK', 'g') AS marked,
        |  ltrim(lower(text)) AS lowered
        |FROM documents""".stripMargin,

    "q_timestamp_parse" ->
      """SELECT event_id,
        |  strftime(ts, '%b %d %H:%M:%S %Y') AS formatted,
        |  strptime(strftime(ts, '%b %d %H:%M:%S %Y'), '%b %d %H:%M:%S %Y') AS parsed
        |FROM events""".stripMargin,

    "q_date_parts" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
        |  CAST(epoch_ms(ts) AS BIGINT) AS epoch_ms
        |FROM events""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) > 50""".stripMargin,

    "q_regex_filter" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE regexp_matches(lower(text), '(spark|stream) (query|filter|join)')""".stripMargin,

    "q_cdc_net" ->
      """WITH pre AS (SELECT DISTINCT user_id FROM events
        |    WHERE ts < TIMESTAMP '2024-01-16'),
        |p0 AS (SELECT user_id, event_type, round(value, 6) AS value,
        |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
        |      lpad(CAST(event_id AS VARCHAR), 12, '0') AS ver,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
        |t AS (SELECT p0.user_id, p0.value, p0.ver,
        |    CASE WHEN pr.user_id IS NULL AND p0.rn = 1 THEN 'I'
        |         WHEN p0.event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM p0 LEFT JOIN pre pr ON p0.user_id = pr.user_id),
        |f AS (SELECT user_id,
        |    first_value(op) OVER wv AS fop, last_value(op) OVER wv AS lop,
        |    last_value(value) OVER wv AS lval, last_value(ver) OVER wv AS lver,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ver) AS rn2
        |  FROM t WINDOW wv AS (PARTITION BY user_id ORDER BY ver
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id,
        |  CASE WHEN lop = 'D' THEN 'D' WHEN fop = 'I' THEN 'I' ELSE 'U' END AS op,
        |  CASE WHEN lop = 'D' THEN NULL ELSE lval END AS value,
        |  lver AS ver
        |FROM f WHERE rn2 = 1 AND NOT (fop = 'I' AND lop = 'D')""".stripMargin,

    "q_cdc_apply" ->
      """WITH snap AS (
        |  SELECT user_id, ts, event_id, value, 'S' AS op FROM (
        |    SELECT user_id, ts, event_id, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-16')
        |  WHERE rn = 1),
        |chg AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
        |merged AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
        |win AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM merged)
        |SELECT user_id, op, event_id, round(value, 6) AS value
        |FROM win WHERE rn = 1 AND op <> 'D'""".stripMargin,

    "q_snapshot_diff" ->
      """WITH bf AS (SELECT user_id, round(value, 6) AS v FROM (
        |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-16') WHERE rn = 1),
        |af AS (SELECT user_id, round(value, 6) AS v FROM (
        |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1)
        |SELECT * FROM (
        |  SELECT COALESCE(bf.user_id, af.user_id) AS user_id,
        |    CASE WHEN bf.user_id IS NULL THEN 'I'
        |         WHEN af.user_id IS NULL THEN 'D'
        |         WHEN bf.v IS DISTINCT FROM af.v THEN 'U' END AS op,
        |    bf.v AS value_old, af.v AS value_new
        |  FROM bf FULL OUTER JOIN af ON bf.user_id = af.user_id)
        |WHERE op IS NOT NULL""".stripMargin,

    "q_zorder" -> {
      val nf = 64
      val (xLo, xHi, yLo, yHi) = (100, 300, 1461, 1825)
      s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
         |  FROM orders),
         |z AS (SELECT x, y, ${ZOrder.morton2Sql("x", "y")} AS z FROM base),
         |ext AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1,
         |    min(z) AS z0, max(z) AS z1 FROM z),
         |st AS (
         |  SELECT 'zorder' AS layout, (z - z0) * $nf // (z1 - z0 + 1) AS f, x, y FROM z, ext
         |  UNION ALL
         |  SELECT 'linear_x', (x - x0) * $nf // (x1 - x0 + 1), x, y FROM z, ext
         |  UNION ALL
         |  SELECT 'linear_y', (y - y0) * $nf // (y1 - y0 + 1), x, y FROM z, ext),
         |files AS (SELECT layout, f, count(*) AS n_rows,
         |    sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
         |      THEN 1 ELSE 0 END) AS n_match,
         |    min(x) AS fx0, max(x) AS fx1, min(y) AS fy0, max(y) AS fy1
         |  FROM st GROUP BY layout, f)
         |SELECT layout, CAST(count(*) AS BIGINT) AS total_files,
         |  CAST(sum(CASE WHEN fx0 <= $xHi AND fx1 >= $xLo AND fy0 <= $yHi AND fy1 >= $yLo
         |    THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
         |  CAST(sum(CASE WHEN fx0 <= $xHi AND fx1 >= $xLo AND fy0 <= $yHi AND fy1 >= $yLo
         |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(sum(n_match) AS BIGINT) AS rows_matching
         |FROM files GROUP BY layout""".stripMargin
    },

    "q_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "q_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l_shipdate > TIMESTAMP '1997-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q_corr" ->
      """WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS spd
        |  FROM lineitem)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((n * sqp - sq * sp) /
        |    (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6) AS corr_qty_price,
        |  round((n * sqd - sq * sd) /
        |    (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)), 6) AS corr_qty_disc,
        |  round((n * spd - sp * sd) /
        |    (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)), 6) AS corr_price_disc
        |FROM m""".stripMargin,

    "q_customer_distribution" ->
      """WITH pc AS (SELECT c.c_custkey,
        |    CAST(count(o.o_custkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_promo_share" ->
      """WITH j AS (SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-02-01')
        |SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN r
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(r) AS DOUBLE) AS total_revenue,
        |  round(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN r
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |    CAST(SUM(r) AS DOUBLE), 6) AS promo_share_pct
        |FROM j""".stripMargin,

    "q_dpp" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN region ON o_custkey % 5 = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY r_name""".stripMargin,

    "q_compaction" ->
      """SELECT 'small' AS stage, CAST(16 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM documents
        |UNION ALL
        |SELECT 'compacted', 4, CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT) FROM documents""".stripMargin,

    // Layout is invisible to semantics: the oracle is the plain join.
    "q_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey, o.o_orderpriority
        |ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 20""".stripMargin,

    "q_bucket_pruning" ->
      """SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
        |GROUP BY o_orderkey""".stripMargin
  )
}
