package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.6 "UDF/UDAF/UDTF"): the lineage
  * digest as an `Aggregator` — order-independent (sum of bounded 64-bit
  * record hashes, commutative), mergeable across partitions, usable from
  * the typed Dataset API where the relational form (x_lineage) is not.
  * Record hash = the same md5-based 60-bit fp used by the oracle-checked
  * queries, so results are cross-checkable.
  */
object DigestAggregator extends Aggregator[(String, String), (Long, Long), (Long, Long)] {

  /** md5-based 60-bit fingerprint mod 1e9+7 — matches the SQL form
    * ('0x'||substr(md5(x),1,15))::BIGINT % 1000000007 exactly.
    */
  def fp(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000000007L
  }

  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), row: (String, String)): (Long, Long) =
    (b._1 + 1, b._2 + fp(row._1 + ":" + row._2))
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): (Long, Long) = r
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
