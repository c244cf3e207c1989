package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[VectorMean]]: element-wise sums + row count. */
final case class VectorMeanBuf(sums: Array[Double], n: Long)

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): element-wise mean of
  * equal-length double vectors — the centroid step a k-means/IVF
  * trainer runs per cell. Demonstrates the engine's custom-aggregate
  * surface: partial buffers merge associatively, so Catalyst runs it
  * as partial + final aggregation with map-side combine like any
  * builtin.
  *
  * Empty groups yield an empty vector; mismatched lengths throw (a
  * corpus invariant violation, not a recoverable state).
  */
object VectorMean extends Aggregator[Array[Double], VectorMeanBuf, Array[Double]] {

  override def zero: VectorMeanBuf = VectorMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VectorMeanBuf, v: Array[Double]): VectorMeanBuf = {
    if (b.n == 0L) VectorMeanBuf(v.clone(), 1L)
    else {
      require(b.sums.length == v.length, s"vector length ${v.length} != ${b.sums.length}")
      val s = b.sums
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VectorMeanBuf(s, b.n + 1)
    }
  }

  override def merge(a: VectorMeanBuf, b: VectorMeanBuf): VectorMeanBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.sums.length == b.sums.length, "buffer length mismatch")
      val s = a.sums
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VectorMeanBuf(s, a.n + b.n)
    }

  override def finish(b: VectorMeanBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray
    else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VectorMeanBuf] = Encoders.product[VectorMeanBuf]

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
