package graft.graph

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Graph analytics over plain edge DataFrames — the shapes a training-data
  * pipeline needs beyond connected components ([[graft.dedup.Dedup.clusters]]
  * and `clustersAlternating` cover those): triangle enumeration and
  * hash-sampled subgraph estimation.
  *
  * The reference has no graph operators; these extend the near-dup /
  * co-occurrence graph family (SURVEY.md §2 extensions) with the standard
  * clustering-coefficient building block.
  */
object Graphs {

  /** Canonicalize an arbitrary undirected edge list to distinct u<v rows —
    * the orientation that makes each triangle enumerable exactly once.
    */
  def canonicalEdges(edges: DataFrame, uCol: String, vCol: String): DataFrame =
    edges
      .select(least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Enumerate triangles (u < v < w) of an undirected graph given canonical
    * u<v edges: wedge join (ab.v = bc.u gives u<v<w paths) closed by a
    * LEFT SEMI probe of the third edge — the closing join materializes no
    * columns and short-circuits per wedge.
    *
    * Scale: wedge count is Σ_v indeg(v)·outdeg(v) under the u<v orientation;
    * for skewed graphs orient by (degree, id) instead so every wedge pivots
    * on its lowest-degree vertex (the standard O(E^1.5) bound). On 100 TB
    * the edge list is shuffled by the join keys only — no vertex-state
    * replication. For counts (not listings) at extreme scale, sample
    * vertices first ([[vertexSample]]) and scale by p⁻³ — the colorful
    * triangle-sampling estimator.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    e.as("ab")
      .join(e.as("bc"), col("ab.v") === col("bc.u"))
      .select(col("ab.u").as("__tu"), col("ab.v").as("__tv"), col("bc.v").as("__tw"))
      .join(e.as("ac"),
        col("__tu") === col("ac.u") && col("__tw") === col("ac.v"), "left_semi")
      .select(col("__tu").as("u"), col("__tv").as("v"), col("__tw").as("w"))
  }

  /** Deterministic vertex-sampling predicate: keep a vertex iff its md5
    * hash-bucket (0–99) falls below `pct` — reproducible across runs,
    * engines, and partitionings (same idiom as stratified sampling).
    * Filtering BOTH endpoints keeps an edge with probability (pct/100)²
    * and a triangle with (pct/100)³, giving the unbiased count estimator
    * count/(pct/100)³.
    */
  def vertexSample(c: Column, pct: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long") % 100 < pct

  /** Per-vertex triangle participation, top `k` with a deterministic
    * (count desc, node asc) tiebreak — the local clustering signal.
    */
  def triangleParticipation(tri: DataFrame, k: Int): DataFrame =
    tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node").asc)
      .limit(k)
}
