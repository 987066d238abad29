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
}
