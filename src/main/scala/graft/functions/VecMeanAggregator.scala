package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of a group of equal-length vectors, as a typed
  * map-side-combining Aggregator. Used by the IVF Lloyd step: the centroid
  * recompute shuffles one (sum-vector, count) partial per (partition, cell)
  * instead of posexploding n×dim rows through two aggregations.
  */
object VecMeanAggregator
    extends Aggregator[(Int, Seq[Double]), (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(buf: (Array[Double], Long), row: (Int, Seq[Double])): (Array[Double], Long) = {
    val v = row._2
    val acc = if (buf._1.length == 0) new Array[Double](v.length) else buf._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, buf._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      val acc = a._1
      var i = 0
      while (i < acc.length) { acc(i) += b._1(i); i += 1 }
      (acc, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Nil
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(r._1.map(_ / r._2))

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
