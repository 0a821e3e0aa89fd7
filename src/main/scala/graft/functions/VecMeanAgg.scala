package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 UDAF row): element-wise mean of
  * double-array columns — the centroid aggregation of an embedding
  * cluster, as a Catalyst-registered `Aggregator`.
  *
  * Buffer is (running sums, count); merge is element-wise add, so the
  * aggregation is shuffle-parallel with map-side partials like any
  * built-in. NOTE: double addition is order-sensitive, so results can
  * differ in final ulps across partitionings — which is why the
  * oracle-verified IVF path ([[graft.operators.Similarity]]) uses exact
  * decimal sums instead; this Aggregator is the idiomatic-API
  * demonstration, equivalence-tested to 1e-9 in VecMeanAggSpec.
  */
object VecMeanAgg extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length) { sums(i) += a(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
