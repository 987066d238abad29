package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Byte-pair-encoding merge learning (Sennrich et al., ACL 2016) — the
  * tokenizer-training loop a pretraining pipeline runs before anything
  * else touches the corpus.
  *
  * Scale shape: BPE statistics live on the WORD-FREQUENCY table, not the
  * corpus — one corpus scan aggregates (word, freq), and every merge round
  * then runs on that table (|vocab| rows, constant in corpus size). Each
  * round is: one combinable pair-count aggregation, ONE collected row (the
  * argmax pair — a scalar per round, the same driver-side footprint as a
  * k-means centroid update), and one fold-rewrite projection. Symbol
  * rewriting is a Column-API `aggregate` fold (greedy left-to-right,
  * non-overlapping) — no UDF, no SQL string splicing.
  */
object Bpe {

  /** Learn `nMerges` merges from the corpus. Returns (rank, left, right,
    * merged, count) in merge order; stops early if no pair repeats.
    * Deterministic: the argmax pair tiebreaks (count desc, left, right).
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"need nMerges >= 1, got $nMerges")
    import spark.implicits._
    var cur = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .select(split(col("w"), "").as("sym"), col("freq"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = cur
        .filter(size(col("sym")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(sym) - 2), " +
            "i -> struct(element_at(sym, i + 1) AS l, element_at(sym, i + 2) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).cast("long").as("n"))
        .filter(col("n") >= 2L)  // a pair seen once compresses nothing
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Row(l: String, r: String, n: Long) = top(0)
        merges += ((rank, l, r, l + r, n))
        // greedy left-to-right non-overlapping rewrite: if the last output
        // symbol is `l` and the next input is `r`, fuse them — matches the
        // reference BPE algorithm's single-pass merge
        val next = cur
          .select(aggregate(col("sym"), array().cast("array<string>"),
            (out, x) => when(
              size(out) > 0 &&
                element_at(out, -1) === lit(l) && x === lit(r),
              concat(slice(out, lit(1), size(out) - lit(1)),
                array(lit(l + r))))
              .otherwise(concat(out, array(x)))).as("sym"),
            col("freq"))
          .persist()
        next.count()  // materialize before dropping the parent
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "count")
  }

  /** Tokenize text with a learned merge list: replay the merges in rank
    * order over each word's characters — the same fold as training, so
    * train-then-tokenize round-trips exactly. Merge lists are small
    * (10k–100k entries) and ship to executors inside the plan.
    * Returns (original columns..., tokens array).
    */
  def tokenize(docs: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    val word = col("__w")
    val folded = merges.foldLeft(split(word, "")) { case (sym, (l, r)) =>
      aggregate(sym, array().cast("array<string>"),
        (out, x) => when(
          size(out) > 0 && element_at(out, -1) === lit(l) && x === lit(r),
          concat(slice(out, lit(1), size(out) - lit(1)), array(lit(l + r))))
          .otherwise(concat(out, array(x))))
    }
    docs
      .withColumn("__w", explode(split(col(textCol), " ")))
      .filter(length(word) > 0)
      .withColumn("tokens", folded)
      .drop("__w")
  }
}
