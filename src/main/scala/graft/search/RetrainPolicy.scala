package graft.search

import java.nio.file.Paths

import graft.util.{Stamp, StoreFs, StoreLock, Tables, Tombstones}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Router-retrain policy for the trained ANN stores — the ACTUATOR for
  * the drift measurements (`q_ann_drift_lloyd_big` measured that at
  * production cell counts, coarse retraining under drift buys +0.095
  * recall@10 that no rerank can recover — a probe routed by stale
  * centroids scans the wrong cell, and the candidate pass never reads
  * the vectors a rerank would need). Before this, the maintenance
  * surface could fold files and purge tombstones but nothing could
  * DECIDE "this store's coarse router is stale, rebuild it".
  *
  * Staleness proxy: APPENDED-ROW MASS vs the mass the router was
  * trained on. Every `buildAt` records the build corpus' row count in
  * `train_mass.txt` ([[recordTrainMass]] — a separate file, not
  * [[graft.similarity.AnnMeta]], because mass is a Long at the family's
  * 3×10^10-row design point and params.txt is an Int contract, and
  * because train mass is POLICY state, not index identity: two stores
  * with different train mass serve identical results). The proxy is
  * then one column-pruned count of the live forward table:
  *
  *   staleFraction = max(0, liveRows − trainRows) / liveRows
  *
  * Appends raise it, a retrain (which re-records mass) resets it, and —
  * deliberately — [[graft.similarity.IvfStore.compact]] does NOT:
  * compaction folds files but preserves every assignment the stale
  * router made, so a proxy that read the post-compact `__gen` column
  * (all zeros) would silently forget the drift. Persisting the build
  * mass is what lets the signal survive compaction. The proxy costs a
  * parquet-footer count — no vectors are read — so a maintenance tier
  * can assess every store on every sweep. (It does not see DELETES of
  * trained-on mass; a delete-heavy deployment lowers the threshold or
  * swaps in a churn proxy — the seam is [[assess]].)
  *
  * Trigger: past `threshold`, [[maybeRetrain]] runs the caller's
  * rebuild under the STORE LOCK ([[StoreLock]]) — a concurrent
  * append/compact holds the same lock, so a retrain can never race a
  * writer (it fails loudly naming the holder, the family's contract).
  * The rebuild callback must therefore be LOCK-FREE (`buildAt`, not
  * `appendBatch`); [[graft.similarity.IvfStore.rebuildFromSelf]] is the
  * self-contained one for the flat store, and the compressed families
  * (PQ/SQ8 codes cannot reconstruct their corpus) pass their source
  * corpus: `maybeRetrain(spark, dest, t)(IvfPqStore.buildAtWithCents(
  * dest, corpus, kmeansCentroids(corpus, …)))` — exactly the retrained
  * twin the drift audit priced.
  *
  * Wired into the maintenance surface as `StoreAdmin.maintain`'s
  * opt-in `retrainAt` threshold; decision rows are driver-gated by
  * `q_ann_retrain_policy` over [[ensureAudit]]'s persisted fixture.
  */
object RetrainPolicy {

  val File = "train_mass.txt"

  /** Default stale-mass trigger: retrain once ≥15% of the live rows
    * were never seen by the router. The drift audit's fixture shape
    * (80% base + 20% shifted append) sits just past it — and the
    * measured +0.095 recall gap at that shape is what makes ~20%
    * unseen mass worth a rebuild.
    */
  val DefaultThreshold = 0.15

  /** One decision row — what [[assess]] computed and what the policy
    * did ([[maybeRetrain]] sets `retrain` iff the rebuild ran).
    */
  final case class RouterDecision(store: String, trainRows: Long,
                                  liveRows: Long, staleFraction: Double,
                                  retrain: Boolean)

  /** Record the row mass the router at `dest` was trained on — called
    * by every `buildAt` AFTER the hyperparameters, BEFORE the
    * artifacts (same ordering argument: a reader never sees artifacts
    * without their metadata). Rides the [[StoreFs]] seam.
    */
  def recordTrainMass(dest: String, rows: Long): Unit = {
    StoreFs.createDirectories(Paths.get(dest))
    StoreFs.writeString(Paths.get(dest, File), s"$rows\n")
  }

  /** True iff `dest` carries a recorded train mass — the guard sweeps
    * use to skip stores built before this contract (their next rebuild
    * records one).
    */
  def hasTrainMass(dest: String): Boolean =
    StoreFs.exists(Paths.get(dest, File))

  /** The recorded train mass; absence is a NAMED error (the AnnMeta
    * argument: assessing under a guessed mass is the disagreement the
    * file exists to prevent).
    */
  def trainMass(dest: String): Long = {
    val p = Paths.get(dest, File)
    require(StoreFs.exists(p),
      s"ANN store at $dest has no $File — built before the retrain-" +
        "policy contract (or the file was lost); rebuild the store to " +
        "record its train mass")
    val s = StoreFs.readString(p).trim
    require(s.toLongOption.isDefined,
      s"ANN store at $dest: malformed $File ('$s' — expected one " +
        "integer row count); corrupt metadata, rebuild the store")
    s.toLong
  }

  /** Compute the staleness proxy for the store at `dest`: one count of
    * the live forward table (byid if the family has one, codes
    * otherwise) against the recorded train mass. Read-only — never
    * takes the lock (assessment must be safe DURING serving).
    */
  def assess(spark: SparkSession, dest: String,
             threshold: Double = DefaultThreshold): RouterDecision = {
    val tm = trainMass(dest)
    val fwd = Seq("byid.parquet", "codes.parquet")
      .map(t => Paths.get(dest, t)).find(StoreFs.isDirectory(_))
    require(fwd.nonEmpty,
      s"ANN store at $dest has neither byid.parquet nor codes.parquet " +
        "— not a store this policy knows how to assess")
    val rows = spark.read.parquet(fwd.get.toString)
    val idCol = if (rows.columns.contains("vec_id")) "vec_id" else "vid"
    val live = Tombstones.dropDead(spark, dest, rows, idCol).count()
    val stale =
      if (live == 0L) 0.0
      else math.max(0L, live - tm).toDouble / live.toDouble
    RouterDecision(dest, tm, live, stale, stale >= threshold)
  }

  /** Assess, and past the threshold run `rebuild` under the store lock
    * (op "retrain") — the lock is what refuses a retrain mid-write: a
    * concurrent append/compact holds it and the acquire throws naming
    * the holder. `rebuild` must be lock-free and must re-record the
    * train mass (every `buildAt` does). Returns the PRE-rebuild
    * decision; re-[[assess]] for the post state.
    */
  def maybeRetrain(spark: SparkSession, dest: String,
                   threshold: Double = DefaultThreshold)
                  (rebuild: => Unit): RouterDecision = {
    val d = assess(spark, dest, threshold)
    if (d.retrain) StoreLock.withLock(dest, "retrain")(rebuild)
    d
  }

  /** The policy's driver-gated audit (`q_ann_retrain_policy`): a CLEAN
    * store (router trained on the full corpus) and a DRIFTED one (the
    * `q_ann_drift` fixture shape — router trained on the 80% base,
    * shifted 20% absorbed as a frozen-space append), assessed, the
    * drifted one retrained by the policy, re-assessed. The three
    * decision rows are PERSISTED under the fixture's stamp
    * ([[graft.similarity.RecallTruth]]'s precedent) so re-runs replay
    * the same rows instead of re-deciding over an already-retrained
    * store. The oracle derives every number from corpus counts — the
    * policy's whole point is that the decision needs nothing more.
    */
  def ensureAudit(spark: SparkSession, sfDir: String): String = {
    val root = graft.similarity.IvfStore.defaultDir(sfDir) + "__policy"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(root, stamp)) {
      StoreAdmin.truncate(root)
      val nc = graft.similarity.IvfStore.DefaultNumCentroids
      val emb = graft.similarity.Similarity.driftedEmbeddings(
        Tables.embeddings(spark, sfDir))
      val clean = s"$root/clean"
      graft.similarity.IvfStore.buildAt(clean, emb)
      val drift = s"$root/drift"
      graft.similarity.IvfStore.buildAt(drift,
        emb.filter(col("vec_id") < nc || col("vec_id") % 5 =!= 0))
      graft.similarity.IvfStore.appendBatch(spark, drift,
        emb.filter(col("vec_id") >= nc && col("vec_id") % 5 === 0))
      val before = maybeRetrain(spark, drift)(
        graft.similarity.IvfStore.rebuildFromSelf(spark, drift))
      val decisions = Seq(
        ("clean", assess(spark, clean)),
        ("drift_before", before),
        ("drift_after", assess(spark, drift)))
      import spark.implicits._
      decisions.map { case (tag, d) =>
        (tag, d.trainRows, d.liveRows,
          BigDecimal(d.staleFraction)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          d.retrain)
      }.toDF("store", "train_rows", "live_rows", "stale_fraction", "retrain")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/decisions.parquet")
      Stamp.write(root, stamp)
    }
    root
  }

  /** The persisted audit's decision rows. */
  def auditRows(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensureAudit(spark, sfDir)}/decisions.parquet")
      .orderBy(col("store"))
}
