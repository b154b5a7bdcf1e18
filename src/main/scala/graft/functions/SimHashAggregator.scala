package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass SimHash as a typed Aggregator: consumes raw token occurrence
  * rows and keeps the 60 per-bit signed counters in a single
  * map-side-combining buffer. Replaces the explode(sequence(0,59)) form,
  * which amplified the token-frequency table 60× through two shuffles —
  * at most one 60-long partial per (partition, doc) ever crosses a wire.
  *
  * Input is the token STRING alone: applied through `functions.udaf` + a
  * relational `groupBy(doc_id)`, so an upstream hash-partitioning on
  * doc_id (the Scans.spread layout) satisfies the aggregation's
  * distribution and the exchange is elided entirely (the typed
  * groupByKey form appended a serialized key column Catalyst cannot
  * equate with doc_id and always re-shuffled the partials).
  *
  * Summing ±1 per token OCCURRENCE is identical to the frequency-weighted
  * ±w per DISTINCT token (the contribution is linear in the count), so the
  * output matches the DuckDB oracle that weights by tf.
  *
  * Hash is the oracle-portable 60-bit md5 prefix: identical to Spark SQL
  * `conv(substring(md5(tok),1,15),16,10)` and DuckDB
  * `('0x'||substr(md5(tok),1,15))::BIGINT` bit-for-bit.
  */
object SimHashAggregator extends Aggregator[String, Array[Long], Long] {

  val Bits = 60

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** first 15 hex chars of md5 = top 60 bits of the first 8 digest bytes */
  private def md5_60(s: String): Long = {
    val d = mdLocal.get()
    d.reset()
    val h = d.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  override def zero: Array[Long] = new Array[Long](Bits)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    val h = md5_60(tok)
    var j = 0
    while (j < Bits) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(r: Array[Long]): Long = {
    var sh = 0L
    var j = 0
    while (j < Bits) { if (r(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}
