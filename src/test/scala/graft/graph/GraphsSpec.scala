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
}
