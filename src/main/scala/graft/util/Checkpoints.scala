package graft.util

import org.apache.spark.sql.{Column, Dataset}

/** Lineage truncation for the iterative operator family (pagerank /
  * connected components / k-core / BPE / k-center): each round must cut
  * the logical plan or the tree doubles per iteration (the plan consumes
  * the previous round twice). Two modes, switched by the
  * `GRAFT_CHECKPOINT_DIR` env var (or system property — test hook):
  *
  *  - unset (default; the local[32] sandbox): `localCheckpoint` — the
  *    round's blocks are cached on executors. Fast (no FS round trip),
  *    but blocks are PINNED to the executors that computed them: on a
  *    real cluster an executor loss destroys both the blocks and the
  *    truncated lineage that could recompute them, killing the job.
  *  - set to an HDFS/S3/NFS path: `SparkContext.setCheckpointDir` once
  *    (only if the caller hasn't already set one), then RELIABLE
  *    `Dataset.checkpoint` — blocks are written to the shared dir, so a
  *    1000-executor run survives executor loss mid-iteration. This is
  *    the mode a real cluster must use; the round-9 review flagged the
  *    pinned-block semantics as the one 100×-scale gap in these plans.
  *
  * Results are bit-identical in both modes (CheckpointsSpec proves it on
  * pagerank + connected components): checkpointing changes WHERE the
  * round's rows are materialized, never their values.
  */
object Checkpoints {

  val EnvVar = "GRAFT_CHECKPOINT_DIR"

  /** Reliable-checkpoint dir, if configured. System property wins over
    * the environment so specs can exercise the reliable path in-process.
    */
  def reliableDir: Option[String] =
    sys.props.get(EnvVar).orElse(sys.env.get(EnvVar)).filter(_.nonEmpty)

  private def ensureDir(ds: Dataset[_], dir: String): Unit = {
    val sc = ds.sparkSession.sparkContext
    // Respect a caller-configured checkpoint dir; set ours only if unset.
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
  }

  /** Lazy lineage cut — plan truncation recorded now, blocks materialized
    * by the next action that consumes the frame (the iterative loops'
    * own per-round action), so no extra job is spawned.
    */
  def cut[T](ds: Dataset[T]): Dataset[T] = reliableDir match {
    case Some(dir) => ensureDir(ds, dir); ds.checkpoint(eager = false)
    case None      => ds.localCheckpoint(eager = false)
  }

  /** Eager lineage cut — materializes immediately (the BPE / k-center
    * loops, where the round's scalar fetch follows directly).
    */
  def cutEager[T](ds: Dataset[T]): Dataset[T] = reliableDir match {
    case Some(dir) => ensureDir(ds, dir); ds.checkpoint(eager = true)
    case None      => ds.localCheckpoint(eager = true)
  }

  /** Eager lineage cut that PINS a hash partitioning (and a within-
    * partition sort order) the planner can credit: repartition by `keys`
    * to the session's configured shuffle-partition count (EXPLICIT count,
    * so AQE cannot coalesce it and break downstream co-partitioning),
    * sort within partitions by the same keys, then cut EAGERLY so the
    * LogicalRDD records the executed plan's outputPartitioning/-Ordering.
    *
    * Why eager: a LAZY cut wraps an unexecuted AdaptiveSparkPlanExec whose
    * outputPartitioning is unknown before execution, so its LogicalRDD
    * carries UnknownPartitioning and every downstream join/groupBy on
    * `keys` re-shuffles the frame — per ROUND in the iterative loops (the
    * r16 batch-3 postmortem). The eager cut costs one construction-time
    * job + one exchange; each loop round then reads the static side
    * exchange-free AND sort-free (guide §2.4: establish the partitioning
    * once). Values are unaffected — partitioning moves rows, never
    * changes them (CheckpointsSpec).
    */
  def cutPartitioned[T](ds: Dataset[T], keys: Column*): Dataset[T] = {
    val spark = ds.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // The construction (often itself a join chain) runs ONCE, with AQE,
    // through a scoped persist; only the final repartition+sort over the
    // cached blocks is planned without AQE. Two reasons, both measured
    // this round (r17 A/B, three variants):
    //  - Dataset.checkpoint records the executed plan's output
    //    partitioning/ordering in its LogicalRDD, but under AQE the
    //    physical plan is an AdaptiveSparkPlanExec whose partitioning
    //    still reads Unknown at capture time (the r16 batch-3 postmortem,
    //    re-confirmed with a 4.1.2 probe) — so the cut job itself must be
    //    planned AQE-off or the pinned layout is lost;
    //  - wrapping the WHOLE construction in the AQE-off window instead
    //    costs its broadcast conversions and partition coalescing
    //    (q_lpa measured 4× slower that way).
    // The pinned count is the session's configured shuffle parallelism —
    // conf-scaled, not a local constant; a measured-bytes/advisory count
    // (AQE's own coalescing policy) was ALSO tried and serialized the
    // compute-bound wedge joins this helper exists for (q_adamic_adar
    // 3.4 → 8.0 s at n=1): the consumers of a pinned table do per-row
    // work far above the bytes-per-partition heuristic's assumptions.
    // AQE is restored in finally; the engine constructs queries
    // single-threaded (Bench/Verify/driver), so no concurrent planning
    // sees the window.
    val cached = ds.persist()
    try {
      cached.count()
      val rep = cached.repartition(n, keys: _*).sortWithinPartitions(keys: _*)
      val aqe = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(aqe)
      spark.conf.set(aqe, "false")
      try cutEager(rep) finally spark.conf.set(aqe, prev)
    } finally cached.unpersist(blocking = false)
  }

  /** `ds.cutLineage()` / `ds.cutLineageEager()` sugar for the loops. */
  implicit class CheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = cut(ds)
    def cutLineageEager(): Dataset[T] = cutEager(ds)
    def cutLineagePartitioned(keys: Column*): Dataset[T] =
      cutPartitioned(ds, keys: _*)
  }
}
