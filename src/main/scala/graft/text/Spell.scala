package graft.text

import graft.util.CacheLedger.CacheOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-driven spell correction — the public-algorithm replacement for the
  * reference's pretrained NorvigSweeting spell-check stage (SURVEY.md §2.9;
  * the pretrained model artifact itself is non-public, but Norvig's
  * frequency-ranked edit-distance algorithm is textbook).
  *
  * Semantics: a suspect token already in the vocabulary is returned as-is;
  * otherwise the correction is the vocabulary term within Levenshtein
  * distance 1 with the highest corpus frequency (ties: lexicographic).
  *
  * Distribution is the SymSpell delete-neighborhood trick: two strings are
  * within Levenshtein distance 1 only if they share a key in
  * {word} ∪ {word minus one char} (equal → same word key; substitution →
  * common delete; insert/delete → one side's delete equals the other), so
  * candidates come from an EQUI-JOIN on the exploded key sets — never a
  * cross join with a distance predicate — and only candidates pay the exact
  * `levenshtein` verification. At scale the vocabulary's key explosion
  * (|vocab| × (len+1) rows) is precomputed once and bucketed by key, like
  * any other serving index.
  */
object Spell {

  /** The word itself plus every single-character deletion of it. */
  private def deleteKeys(tcol: String): Column = expr(
    s"""array_distinct(concat(array($tcol),
       |  transform(sequence(1, length($tcol)),
       |    i -> concat(substring($tcol, 1, i - 1),
       |                substring($tcol, i + 1, length($tcol))))))""".stripMargin)

  /** Correct `suspects` (id, typo) against `vocab` (term, freq).
    * Returns (id, typo, corrected, freq); suspects with no vocabulary term
    * within distance 1 are dropped (no correction exists).
    */
  def correct(vocab: DataFrame, suspects: DataFrame): DataFrame = {
    // the (usually aggregated) vocabulary plan feeds three joins — persist
    // so one action doesn't recompute the caller's corpus aggregation
    // three times (MEMORY_AND_DISK, LRU-evictable, same policy as
    // Dedup.jaccardPairs)
    val v = vocab.persistBounded()
    val vocabKeys = v.select(col("term"), col("freq"),
      explode(deleteKeys("term")).as("__k"))
    val known = suspects
      .join(v, suspects("typo") === v("term"))
      .select(col("id"), col("typo"), col("typo").as("corrected"), col("freq"))
    val unknown = suspects
      .join(v, suspects("typo") === v("term"), "left_anti")
    // no distinct needed: duplicate candidate rows from shared delete keys
    // are identical (id, typo, corrected, freq) tuples, and the rn = 1
    // window below collapses them with identical output
    val cands = unknown
      .select(col("id"), col("typo"), explode(deleteKeys("typo")).as("__k"))
      .join(vocabKeys, "__k")
      .select(col("id"), col("typo"), col("term").as("corrected"), col("freq"))
      .filter(levenshtein(col("typo"), col("corrected")) <= 1)
    val w = Window.partitionBy(col("id"), col("typo"))
      .orderBy(col("freq").desc, col("corrected").asc)
    cands
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .unionByName(known)
  }
}
