package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator over (qid, nid, score) rows: the
  * buffer holds at most k (nid, score) entries ordered by (score desc,
  * nid asc), and partials combine map-side — so only k rows per map
  * partition per query group ever cross the shuffle. This replaces the
  * `Window.partitionBy(qid) + row_number <= k` ranking, which funnels
  * EVERY scored candidate row of a query through a single reducer — the
  * per-query bottleneck at 10^12 corpus rows.
  *
  * Tie-break (score desc, nid asc) matches `ORDER BY cos_r DESC, nid` so
  * the exact-oracle comparison is deterministic.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  @inline private def better(aNid: Long, aS: Double, bNid: Long, bS: Double): Boolean =
    aS > bS || (aS == bS && aNid < bNid)

  private def insert(b: List[(Long, Double)], v: (Long, Double)): List[(Long, Double)] =
    if (b.lengthCompare(k) >= 0 && !better(v._1, v._2, b.last._1, b.last._2)) b
    else {
      val (keep, rest) = b.span(e => better(e._1, e._2, v._1, v._2))
      (keep ::: v :: rest).take(k)
    }

  override def zero: List[(Long, Double)] = Nil

  override def reduce(b: List[(Long, Double)], row: (Long, Long, Double)): List[(Long, Double)] =
    insert(b, (row._2, row._3))

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(r: List[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder[List[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
