package graft.operators

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5): the reference's runtime
  * assertion "after merge-dedup, the key is unique"
  * (`Tweets_preprocessing.py:470`) and friends, over generated inputs.
  * Plain ScalaCheck generators with fixed seeds (scalatestplus isn't in the
  * offline dependency set) — deterministic, 8 samples per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(60, for {
      key <- Gen.chooseNum(0L, 9L)
      ver <- Gen.chooseNum(0L, 20L)
      v   <- Gen.chooseNum(0, 1000).map(_ / 10.0)
    } yield (key, ver, v))

  test("dedupKeepFirst: key unique afterwards, rows from input, idempotent") {
    samples(rowsGen, 8).foreach { rows =>
      val df = rows.toDF("key", "ver", "v")
      val out = Relational.dedupKeepFirst(df,
        key = Seq(col("key")), order = Seq(col("ver").desc, col("v").asc))
      val collected = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(collected.map(_._1).distinct.length == collected.length)
      assert(collected.toSet.subsetOf(rows.toSet))
      assert(collected.map(_._1).toSet == rows.map(_._1).toSet)
      val again = Relational.dedupKeepFirst(out,
        key = Seq(col("key")), order = Seq(col("ver").desc, col("v").asc))
      assert(again.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        == collected.toSet)
    }
  }

  test("semi ∪ anti partitions the left side for any key set") {
    val keysGen = Gen.listOf(Gen.chooseNum(0L, 12L))
    samples(Gen.zip(rowsGen, keysGen), 8).foreach { case (rows, keys) =>
      val df = rows.toDF("key", "ver", "v")
      val kdf = keys.toDF("key")
      val semi = Relational.semiJoin(df, kdf, Seq("key")).count()
      val anti = Relational.antiJoin(df, kdf, Seq("key")).count()
      assert(semi + anti == rows.length)
    }
  }

  private val docsGen: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("spark", "query", "join", "scan", "sort", "merge")
    Gen.listOfN(8, Gen.listOfN(12, word).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("minhash-LSH pairs are a subset of exhaustive jaccard pairs") {
    samples(docsGen, 4).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val exhaustive = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Dedup.minHashLsh(df, "doc_id", "text", 3, 12, 2, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(lsh.subsetOf(exhaustive))
    }
  }

  test("clusters matches a reference union-find on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(1, 12)
      m <- Gen.chooseNum(0, 15)
      edges <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield (n, edges.filter { case (a, b) => a != b })
    samples(graphGen, 8).foreach { case (n, edges) =>
      val ids = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.clusters(ids, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference oracle: plain driver-side union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  test("clustersAlternating matches the same union-find on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(1, 12)
      m <- Gen.chooseNum(0, 15)
      edges <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield (n, edges.filter { case (a, b) => a != b })
    samples(graphGen, 8).foreach { case (n, edges) =>
      val ids = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.clustersAlternating(ids, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  test("packChunks: token totals conserved, seq ids contiguous from 0 per shard") {
    val chunksGen = Gen.listOfN(30, for {
      shard <- Gen.oneOf("a", "b", "c")
      doc   <- Gen.chooseNum(0L, 9L)
      cid   <- Gen.chooseNum(0L, 3L)
      tok   <- Gen.chooseNum(1L, 8L)
    } yield (shard, doc, cid, tok))
    samples(chunksGen, 8).foreach { rows =>
      val dedup = rows.distinctBy(t => (t._1, t._2, t._3))
      val df = dedup.toDF("source", "doc_id", "chunk_id", "n_chunk_tokens")
      val out = graft.text.TextAnalysis.packChunks(df, "source",
          Seq(col("doc_id"), col("chunk_id")), "n_chunk_tokens", budget = 10)
        .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      // conservation: every chunk appears exactly once with its tokens
      assert(out.map(_._2).sum == dedup.map(_._4).sum)
      out.groupBy(_._1).foreach { case (_, shard) =>
        val seqs = shard.map(_._3)
        // seq ids start at 0 and are contiguous per shard
        assert(seqs.min == 0L)
        assert(seqs.toSet == (0L to seqs.max).toSet)
        // no sequence except possibly the last can be underfull by a
        // whole chunk: tokens-before of any non-zero seq ≥ budget·seq
        shard.groupBy(_._3).toSeq.sortBy(_._1).dropRight(1).foreach {
          case (_, chunks) => assert(chunks.map(_._2).sum > 0)
        }
      }
    }
  }

  test("ngramCounts: total occurrences equal sum over docs of (len - n + 1)") {
    samples(docsGen, 4).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val total = graft.text.TextAnalysis.ngramCounts(df, "text", n = 2, k = 10000)
        .agg(sum("n")).head.getLong(0)
      val want = docs.map { case (_, t) =>
        val len = t.split(" ").length
        math.max(0, len - 1)
      }.sum
      assert(total == want)
    }
  }

  test("triangles matches brute-force triple enumeration on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(3, 14)
      m <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield edges.filter { case (a, b) => a != b }
    samples(graphGen, 8).foreach { edges =>
      val canon = graft.graph.Graphs.canonicalEdges(edges.toDF("a", "b"), "a", "b")
      val got = graft.graph.Graphs.triangles(canon)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val vs = es.flatMap { case (a, b) => Set(a, b) }.toSeq.sorted
      val want = (for {
        u <- vs; v <- vs if u < v; w <- vs if v < w
        if es((u, v)) && es((v, w)) && es((u, w))
      } yield (u, v, w)).toSet
      assert(got == want, s"edges=$edges")
    }
  }

  test("tokenEntropy bounded by [0, log2(n_types)] on random docs") {
    val docGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 999L),
      Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))))
    samples(docGen, 5).foreach { docs =>
      val rows = graft.text.TextAnalysis
        .tokenEntropy(docs.distinctBy(_._1).toDF("doc_id", "text"), "doc_id", "text")
        .collect()
      rows.foreach { r =>
        val (types, h) = (r.getLong(2), r.getDouble(3))
        assert(h >= 0.0 && h <= math.log(types.toDouble) / math.log(2.0) + 1e-9,
          s"entropy $h outside [0, log2($types)]")
      }
    }
  }

  test("cusum alarm counts are partitioning-independent") {
    val evGen = Gen.listOfN(50, for {
      id <- Gen.chooseNum(0L, 4999L)
      u  <- Gen.chooseNum(0L, 3L)
      v  <- Gen.chooseNum(0, 1000).map(_ / 10.0)
    } yield (id, new java.sql.Timestamp(1700000000000L + id * 1000), u, "m", v))
    samples(evGen, 5).foreach { evs =>
      val df = evs.distinctBy(_._1).toDF("event_id", "ts", "user_id", "event_type", "value")
      def run(d: org.apache.spark.sql.DataFrame) =
        graft.streaming.EventStreams.cusum(d, kappa = 2.0, h = 10.0)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(run(df) == run(df.repartition(7)), s"evs=${evs.take(5)}...")
    }
  }

  test("budgetCutoff ≡ naive global-order prefix, under heavy ties and any partitioning") {
    // few distinct ord values (heavy ties AT range boundaries — the case a
    // range-misassignment would corrupt), zero-token rows, varied budgets
    val rowsGen = Gen.listOfN(80, for {
      id  <- Gen.chooseNum(0L, 999L)
      tok <- Gen.chooseNum(0L, 30L)
      ord <- Gen.chooseNum(0, 6).map(_ / 6.0)
    } yield (id, tok, ord))
    val budgets = Seq(0L, 17L, 200L, 100000L)
    samples(rowsGen, 6).zipWithIndex.foreach { case (raw, i) =>
      val rows = raw.distinctBy(_._1)
      val budget = budgets(i % budgets.length)
      val df = rows.toDF("id", "n_tok", "ord").repartition(5)
      val got = graft.text.Curation.budgetCutoff(df, "id", "n_tok", "ord", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(_._1)
      val expected = rows.sortBy { case (id, _, ord) => (-ord, id) }
        .scanLeft((0L, 0L, 0.0, 0L)) { case ((_, _, _, cum), (id, tok, ord)) =>
          (id, tok, ord, cum + tok)
        }.drop(1)
        .takeWhile(_._4 <= budget)
        .sortBy(_._1)
      assert(got.toSeq == expected, s"budget=$budget rows=${rows.take(5)}...")
    }
  }

  test("mixtureSample ≡ naive per-source global-window prefix (any nRanges, any partitioning)") {
    val docGen = Gen.listOfN(60, for {
      id  <- Gen.chooseNum(0L, 999L)
      src <- Gen.oneOf("src1", "src2", "src3")
      n   <- Gen.chooseNum(1, 8)
    } yield (id, src, (1 to n).map(k => s"t$k").mkString(" ")))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    samples(docGen, 5).zipWithIndex.foreach { case (raw, i) =>
      val rows = raw.distinctBy(_._1)
      val df = rows.toDF("doc_id", "source", "text").repartition(5)
      val nRanges = Seq(1, 4, 32, 256)(i % 4)
      val got = graft.text.Curation.mixtureSample(df, "source", "doc_id", "text",
          nRanges = nRanges)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // reference semantics: per source, one global (md5 asc, id asc)
      // running sum cut at the uniform-plan budget
      val total = rows.map(_._3.split(" ").length.toLong).sum
      val target = total / rows.map(_._2).distinct.length
      val expected = rows.groupBy(_._2).flatMap { case (src, ds) =>
        val planned = math.min(ds.map(_._3.split(" ").length.toLong).sum, target)
        var cum = 0L
        ds.sortBy(d => (md5hex(d._1.toString), d._1)).flatMap { d =>
          val n = d._3.split(" ").length.toLong
          cum += n
          if (cum <= planned) Some((src, d._1, n, cum)) else None
        }
      }.toSet
      assert(got == expected, s"nRanges=$nRanges rows=${rows.take(5)}...")
    }
  }

  test("Materialize: any partition of the rows merges to the full-data state") {
    val partGen = Gen.zip(rowsGen, Gen.listOfN(60, Gen.chooseNum(0, 2)))
    samples(partGen, 8).foreach { case (rows, cuts) =>
      val df = rows.toDF("key", "ver", "v")
      def stateOf(part: Int) = Materialize.aggState(
        rows.zip(cuts).filter(_._2 == part).map(_._1).toDF("key", "ver", "v"),
        Seq("key"), "v")
      val merged = Materialize.serve(
        Materialize.merge(Materialize.merge(stateOf(0), stateOf(1), Seq("key")),
          stateOf(2), Seq("key")), Seq("key"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      val direct = Materialize.serve(
        Materialize.aggState(df, Seq("key"), "v"), Seq("key"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      assert(merged == direct, s"rows=${rows.take(5)}...")
    }
  }

  test("reservoirSample: |group| cap, subset of input, deterministic for any k") {
    val gen = Gen.zip(rowsGen, Gen.chooseNum(1, 8))
    samples(gen, 8).foreach { case (rows, k) =>
      val df = rows.toDF("key", "ver", "v").withColumn("id",
        col("key") * 1000 + col("ver") * 17 + (col("v") * 10).cast("long"))
      val out = Relational.reservoirSample(df, "id", "key", k)
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      val perGroup = out.groupBy(_._1).view.mapValues(_.length)
      val inSizes = df.collect().map(r => r.getLong(0)).groupBy(identity)
        .view.mapValues(_.length)
      perGroup.foreach { case (g, n) =>
        assert(n == math.min(k, inSizes(g)), s"group $g: $n vs k=$k")
      }
      val again = Relational.reservoirSample(df.repartition(5), "id", "key", k)
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(again.toSet == out.toSet)
    }
  }

  test("native asof == window asof on random event histories") {
    // (key, time-as-micros-backed long id, payload); right pre-deduped
    // per (key, time) — the operator's input contract
    val evGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
      for {
        l <- Gen.listOfN(40, for {
          k <- Gen.chooseNum(0L, 6L)
          t <- Gen.chooseNum(0L, 30L)
          id <- Gen.chooseNum(0L, 999L)
        } yield (k, t, id))
        r <- Gen.listOfN(25, for {
          k <- Gen.chooseNum(0L, 7L)
          t <- Gen.chooseNum(0L, 30L)
          p <- Gen.chooseNum(0L, 99L)
        } yield (k, t, p))
      } yield (l, r.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toList)
    samples(evGen, 8).foreach { case (lRows, rRows) =>
      val l = lRows.toDF("user_id", "ts", "event_id")
      val r = rRows.toDF("user_id", "ts", "click_id")
      def collected(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3))).sortBy(t => (t._1, t._2, t._3))
      val native = collected(graft.plans.AsofNative.join(
        l, r, "user_id", "ts", Seq("event_id"), "click_id"))
      val window = collected(Relational.asofJoin(
        l, r, "user_id", "ts", Seq("event_id"), "click_id"))
      assert(native.toSeq == window.toSeq)
    }
  }
}
