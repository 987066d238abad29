package graft.text

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Byte-pair-encoding merge learning and replay (Sennrich et al., ACL
  * 2016) — the tokenizer-training loop a pretraining pipeline runs before
  * anything else touches the corpus.
  *
  * Scale shape: BPE statistics live on the WORD-FREQUENCY table, not the
  * corpus — one corpus scan aggregates (word, freq), and every round then
  * runs on that table (|vocab| rows, constant in corpus size). Lineage is
  * cut each round with `localCheckpoint` (the [[graft.dedup.Dedup.clusters]]
  * iterative-loop pattern) so the driver-side plan stays bounded no matter
  * how many rounds run. Symbol rewriting is a Column-API `aggregate` fold —
  * no UDF, no SQL string splicing, constant expression depth.
  */
object Bpe {

  /** Separator for pair-rank map keys; U+0001 cannot appear in
    * space-delimited text tokens of this corpus. Override-by-fork if your
    * corpus can contain it.
    */
  private val Sep = "\u0001"

  /** Learn `nMerges` merges from the corpus. Returns (rank, left, right,
    * merged, count) in merge order; stops early if no pair repeats.
    * Deterministic: the argmax pair tiebreaks (count desc, left, right).
    *
    * BATCHED (round 8): instead of one Spark job per merge, each round
    * collects the top-`batchTopK` pair counts and accepts the maximal
    * ranked prefix that is provably what strict sequential BPE would pick,
    * then applies the whole batch in ONE fold-rewrite projection. The
    * acceptance proof obligations, checked driver-side per candidate:
    *
    *  1. pairwise symbol-disjoint with every earlier accepted pair — a
    *     disjoint merge cannot change this pair's count, so its collected
    *     count stays exact through the batch;
    *  2. the merged string is NOT an existing symbol (tracked alphabet =
    *     initial chars + merges so far) — otherwise the merge would ADD
    *     occurrences to existing pairs containing that symbol and a
    *     skipped pair's count could grow past a later accepted one;
    *  3. every accepted count (after the first — the collected argmax is
    *     sequentially correct unconditionally) is STRICTLY greater than
    *     every non-accepted count (first overlapping pair, first excluded
    *     pair, and the truncation floor) — decreased overlapping pairs
    *     stay ≤ their original count and brand-new pairs are bounded by
    *     the original count of some existing pair sharing a merged
    *     symbol, both < the accepted batch, so no tiebreak ambiguity.
    *
    * On Zipf-shaped corpora the top counts are mostly distinct and
    * disjoint, so batches run tens of merges per job instead of one —
    * jobs drop from O(merges) to O(merges / batch). Worst case (plateau
    * of tied or chained pairs) degrades gracefully to the exact
    * one-merge-per-round loop. Equality with [[learnMergesLocal]] is
    * spec-asserted on the fixture.
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  nMerges: Int, batchTopK: Int = 256): DataFrame = {
    require(nMerges >= 1, s"need nMerges >= 1, got $nMerges")
    import spark.implicits._
    var cur = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .select(split(col("w"), "").as("sym"), col("freq"))
      .cutLineageEager()
    // the symbol alphabet: initial characters now, plus every merged
    // string as it is created — guard #2 needs exact membership
    val alphabet = scala.collection.mutable.HashSet.empty[String]
    alphabet ++= cur.select(explode(col("sym")).as("s")).distinct()
      .collect().map(_.getString(0))
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
        .limit(batchTopK)
        .collect()
      if (top.isEmpty) done = true
      else {
        // counts of pairs beyond the collected window are ≤ the floor
        val floor = if (top.length == batchTopK) top.last.getLong(2) else 1L
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val usedSyms = scala.collection.mutable.HashSet.empty[String]
        var boundary = floor
        var stop = false
        for (row <- top if !stop) {
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          val disjoint = !usedSyms.contains(l) && !usedSyms.contains(r)
          val freshSymbol = !alphabet.contains(l + r)
          if (accepted.size >= nMerges - rank + 1 ||
              !disjoint || (!freshSymbol && accepted.nonEmpty)) {
            stop = true
            boundary = math.max(boundary, n)
          } else {
            accepted += ((l, r, n))
            usedSyms += l += r
            if (!freshSymbol) stop = true // argmax alone is safe; later ones aren't
          }
        }
        // guard #3: the batch must sit strictly above every competitor;
        // the argmax itself (head) is always sequentially correct
        while (accepted.size > 1 && accepted.last._3 <= boundary)
          accepted.remove(accepted.size - 1)
        accepted.foreach { case (l, r, n) =>
          merges += ((rank, l, r, l + r, n))
          alphabet += (l + r)
          rank += 1
        }
        // localCheckpoint (eager) both materializes the round and CUTS
        // lineage — without it the plan chains one rewrite per round and
        // driver-side analysis goes quadratic (Dedup.clusters precedent)
        val folded = accepted.foldLeft(col("sym")) { case (c, (l, r, _)) =>
          mergeFold(c, lit(l), lit(r))
        }
        val next = cur
          .select(folded.as("sym"), col("freq"))
          .cutLineageEager()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "count")
  }

  /** Driver-side merge learning over the capped word-frequency table — the
    * scale path for REAL merge counts. [[learnMerges]] is exact but runs
    * one Spark job per merge (a 32k-merge train = 32k sequential jobs);
    * here ONE Spark aggregation + TakeOrdered produces the top-`maxWords`
    * (freq desc, word asc) word-frequency pairs — the bounded-vocabulary
    * cap every production tokenizer trainer applies, since BPE statistics
    * depend only on this table, never the corpus — and the merge loop then
    * runs in memory over |vocab| rows. Identical statistics (per-position
    * adjacent pair counts weighted by freq), identical tiebreak
    * (count desc, left, right), identical `>= 2` stopping rule and greedy
    * fold as [[learnMerges]], so with `maxWords >= |vocab|` the result is
    * equal row-for-row (spec-asserted on the fixture). Returns
    * (rank, left, right, merged, count) in merge order.
    */
  def learnMergesLocal(docs: DataFrame, textCol: String, nMerges: Int,
                       maxWords: Int = 1 << 20): Seq[(Int, String, String, String, Long)] = {
    require(nMerges >= 1, s"need nMerges >= 1, got $nMerges")
    var words: Array[(Array[String], Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(row => (row.getString(0).split("").filter(_.nonEmpty), row.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      val cands = counts.filter(_._2 >= 2L)
      if (cands.isEmpty) done = true
      else {
        val ((l, r), n) = cands.minBy { case ((pl, pr), pn) => (-pn, pl, pr) }
        merges += ((rank, l, r, l + r, n))
        words = words.map { case (syms, f) => (foldLocal(syms, l, r), f) }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** In-memory twin of [[mergeFold]] — same greedy left-to-right
    * non-overlapping fuse, over a driver-side symbol array.
    */
  private def foldLocal(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
      else out += x
    }
    out.toArray
  }

  /** Greedy left-to-right non-overlapping fuse of adjacent (l, r) symbol
    * pairs — the reference BPE single-pass merge, as ONE `aggregate` fold
    * (constant expression depth; `l`/`r` may be data columns).
    */
  private def mergeFold(sym: Column, l: Column, r: Column): Column =
    aggregate(sym, array().cast("array<string>"),
      (out, x) => when(
        size(out) > 0 && element_at(out, -1) === l && x === r,
        concat(slice(out, lit(1), size(out) - lit(1)),
          array(concat(l, r))))
        .otherwise(concat(out, array(x))))

  /** Tokenize with a learned merge list — the standard BPE ENCODE loop:
    * each round, every word finds its best-rank applicable pair (lookup in
    * a rank map, no per-merge expression nesting) and fuses its
    * occurrences; rounds bound by the longest word's length, INDEPENDENT
    * of merge-list size (a 100k-entry list nests zero expressions — it is
    * data in one map literal). Applying pairs in rank order this way
    * reproduces training exactly, so train-then-tokenize round-trips.
    *
    * Work runs on the DISTINCT-word table and joins back, so corpus size
    * only pays the explode + join; per-doc token order is preserved via
    * the word position index. Returns (idCol, tokens).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)], maxRounds: Int = 64): DataFrame = {
    require(merges.nonEmpty, "empty merge list — nothing to apply")
    val rankMap = map_from_arrays(
      lit(merges.map { case (l, r) => l + Sep + r }.toArray),
      lit(merges.indices.map(_.toLong).toArray))
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("__wpos", "__w")))
      .filter(length(col("__w")) > 0)
    var vocab = words.select(col("__w")).distinct()
      .select(col("__w"), split(col("__w"), "").as("__sym"))
      .cutLineageEager()
    var round = 0
    var active = true
    while (active && round < maxRounds) {
      // guard: for a fully-merged single-symbol word, sequence(0, -1)
      // would be a DESCENDING [0, -1] and index past the array under ANSI
      val pairKeys = when(size(col("__sym")) >= 2,
        transform(sequence(lit(0), size(col("__sym")) - 2),
          i => concat(element_at(col("__sym"), i + 1), lit(Sep),
            element_at(col("__sym"), (i + 2).cast("int")))))
        .otherwise(array().cast("array<string>"))
      val stepped = vocab
        .withColumn("__ranks", transform(pairKeys, k => element_at(rankMap, k)))
        .withColumn("__best", array_min(filter(col("__ranks"), r => r.isNotNull)))
        .withColumn("__bestKey",
          element_at(pairKeys, array_position(col("__ranks"), col("__best")).cast("int")))
        .withColumn("__sym",
          when(col("__best").isNull, col("__sym"))
            .otherwise(mergeFold(col("__sym"),
              element_at(split(col("__bestKey"), Sep), 1),
              element_at(split(col("__bestKey"), Sep), 2))))
        .select(col("__w"), col("__sym"), col("__best").isNotNull.as("__changed"))
        .cutLineageEager()
      active = stepped.filter(col("__changed")).limit(1).count() > 0
      val next = stepped.select(col("__w"), col("__sym")).cutLineageEager()
      vocab.unpersist()
      stepped.unpersist()
      vocab = next
      round += 1
    }
    val out = words
      .join(vocab, "__w")
      .groupBy(col(idCol))
      .agg(flatten(expr("transform(array_sort(collect_list(struct(__wpos, __sym))), s -> s.__sym)"))
        .as("tokens"))
    vocab.unpersist()
    out
  }
}
