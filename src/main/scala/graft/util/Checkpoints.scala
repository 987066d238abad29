package graft.util

import org.apache.spark.sql.Dataset

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

  /** `ds.cutLineage()` / `ds.cutLineageEager()` sugar for the loops. */
  implicit class CheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = cut(ds)
    def cutLineageEager(): Dataset[T] = cutEager(ds)
  }
}
