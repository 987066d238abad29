package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` top-k-by-value — the engine's typed-UDAF surface
  * (SURVEY.md §2.11; complements the codegen `Expression`s and the
  * native `SparkPlan`): per group, the k largest (value, id) pairs with
  * deterministic (value desc, id asc) ordering.
  *
  * Why an Aggregator instead of a rank window: the window formulation
  * shuffles EVERY row to its group's partition before ranking
  * (WindowGroupLimit trims but still sorts per task); an Aggregator's
  * reduce/merge runs map-side, so each task forwards AT MOST k pairs per
  * group — the shuffle carries O(groups·k) regardless of input size.
  * The buffer is a sorted-array bound at k, so merge is O(k).
  *
  * State is a Seq of (value, id) kept sorted desc/asc and truncated —
  * tiny, immutable, encoder-friendly.
  */
class TopKByValue(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)],
                     v: (Double, Long)): Seq[(Double, Long)] =
    ((v +: buf).sortBy { case (x, id) => (-x, id) }).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] = insert(b, a)

  override def merge(b1: Seq[(Double, Long)],
                     b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sortBy { case (x, id) => (-x, id) }.take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
