package graft.stats

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("skewAudit ranks the heavy key first with its corpus share") {
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c")).toDF("k")
    val out = Profile.skewAudit(df, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("hot", 6L, 1L, 0.6), ("a", 2L, 2L, 0.2)))
  }

  test("columnProfile: ndv, nulls, min/max as strings across mixed types") {
    val df = Seq((1L, Some(2.5), "x"), (2L, None, "y"), (2L, Some(7.0), "y"))
      .toDF("id", "v", "s")
    val rows = Profile.columnProfile(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows("id") == ((2L, 0L, "1", "2")))
    assert(rows("v") == ((2L, 1L, "2.5", "7.0")))
    assert(rows("s") == ((2L, 0L, "x", "y")))
    // empty column list: a clear error, not an opaque reduce() failure
    assertThrows[IllegalArgumentException] {
      Profile.columnProfile(df, Seq.empty)
    }
  }

  test("approxQuantiles: tolerance uses |exact| — negative percentiles can fail") {
    // all-negative column: a correct sketch passes, and the flag is NOT
    // vacuously true (signed denominator would make any error pass)
    val df = (1L to 1000L).map(v => -v).toDF("v")
    val out = Profile.approxQuantiles(df, "v", Seq(0.5), 10000, tol = 0.05)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(out.head._1 == -500.5 && out.head._2)
    // zero percentile: exact 0 demands exact sketch (here it is exact)
    val zeros = Seq.fill(100)(0L).toDF("v")
    val z = Profile.approxQuantiles(zeros, "v", Seq(0.5), 10000, tol = 0.05)
      .collect().head
    assert(z.getDouble(1) == 0.0 && z.getBoolean(2))
  }

  test("approxQuantiles: exact percentile emitted, sketch within tolerance") {
    val df = (1L to 1000L).toDF("v")
    val out = Profile.approxQuantiles(df, "v", Seq(0.5, 0.99),
      accuracy = 10000, tol = 0.05)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0.5, 0.99))
    assert(out.head._2 == 500.5) // R-7 interpolated median of 1..1000
    assert(out.forall(_._3))
  }

  test("winsorizeStats reports R-7 bounds and exact clip counts") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("k", "v")
    val r = Profile.winsorizeStats(df, "k", "v", lo = 0.05, hi = 0.95).head()
    assert(r.getAs[Long]("n") == 100L)
    // R-7 on 1..100: p05 = 1 + 0.05*99 = 5.95; p95 = 1 + 0.95*99 = 95.05
    assert(r.getAs[Double]("p_lo") == 5.95)
    assert(r.getAs[Double]("p_hi") == 95.05)
    assert(r.getAs[Long]("n_clipped_lo") == 5L)   // 1..5 < 5.95
    assert(r.getAs[Long]("n_clipped_hi") == 5L)   // 96..100 > 95.05
  }

  test("groupRegression recovers exact trends and drops degenerate groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows =
      (1 to 10).map(i => ("up", i.toLong, 2.0 * i + 3.0)) ++      // y = 2x + 3
        (1 to 10).map(i => ("flat", i.toLong, 7.5)) ++             // slope 0
        Seq(("single", 1L, 4.0))                                   // n=1: dropped
    val out = Profile.groupRegression(rows.toDF("k", "ord", "y"), "k",
      Seq(col("ord").asc), "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("up", "flat"))
    assert(out("up") == ((10L, 2.0, 3.0)))
    assert(out("flat") == ((10L, 0.0, 7.5)))
  }

  test("hll sketch table serves rollups within tolerance of exact distincts") {
    import spark.implicits._
    // 3 types × 5 partitions, overlapping user sets across partitions so
    // the union actually deduplicates cross-sketch
    val rows = for {
      t <- 1 to 3; p <- 1 to 5; u <- 1 to 200
      if (u + t * 7 + p * 13) % 3 != 0
    } yield (s"t$t", p, (u % (50 * t)).toLong)
    val df = rows.toDF("typ", "part", "user")
    val sketches = Profile.hllSketchTable(df, Seq("typ", "part"), "user")
    assert(sketches.count() == 15) // one sketch per cell
    val servedTyp = Profile.hllServe(sketches, Seq("typ"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactTyp = df.groupBy($"typ")
      .agg(org.apache.spark.sql.functions.countDistinct($"user").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactTyp.foreach { case (t, exact) =>
      val est = servedTyp(t)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$t: est $est vs exact $exact")
    }
    // global rollup from the same sketch table (no raw rescans)
    val global = Profile.hllServe(sketches.withColumn("all",
        org.apache.spark.sql.functions.lit(1)), Seq("all"))
      .collect().head.getLong(1)
    val exactGlobal = df.select($"user").distinct().count()
    assert(math.abs(global - exactGlobal).toDouble / exactGlobal <= 0.05)
    // the sketch table survives parquet persistence — the serving-store
    // path: estimates from the round-tripped binary column are identical
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    sketches.write.mode("overwrite").parquet(dir)
    val persisted = Profile.hllServe(spark.read.parquet(dir), Seq("typ"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(persisted == servedTyp)
  }

  test("giniByGroup: exact rank identity — balanced is 0, skew measured") {
    // sums per group: a=2 (1+1), b=2, c=4 → sorted 2,2,4: S=8, S1=2+4+12=18
    // G = (2·18 − 4·8) / (3·8) = 4/24 = 0.166667
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("c", 4L)).toDF("g", "x")
    val r = Profile.giniByGroup(df, "g", "x").head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 8L)))
    assert(r.getDouble(2) == 0.166667)
    // perfectly balanced corpus → exactly 0
    val bal = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("g", "x")
    assert(Profile.giniByGroup(bal, "g", "x").head().getDouble(2) == 0.0)
  }

  test("benfordAudit: exact digit counts, sub-1 rows excluded, chi2 formula") {
    // digits: 1 (×2: 1.5, 199.0), 2 (×1: 23.4), 9 (×1: 9000.0);
    // 0.5 excluded (< 1). tot = 4.
    val df = Seq(1.5, 199.0, 23.4, 9000.0, 0.5).toDF("v")
    val out = Profile.benfordAudit(df, "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set(1L, 2L, 9L))
    def exp(d: Int) = math.log(1.0 + 1.0 / d) / math.log(10.0)
    def chi(n: Long, d: Int) = {
      val e = 4.0 * exp(d); r6((n - e) * (n - e) / e)
    }
    assert(out(1L) == ((2L, 0.5, r6(exp(1)), chi(2, 1))))
    assert(out(2L) == ((1L, 0.25, r6(exp(2)), chi(1, 2))))
    assert(out(9L) == ((1L, 0.25, r6(exp(9)), chi(1, 9))))
  }
}
