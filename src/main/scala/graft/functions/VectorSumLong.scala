package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise SUM of equal-length long vectors —
  * [[VectorMean]]'s exact-integer sibling, built for the q203
  * signature stage (round 13): summing per-row `q·r` sign vectors
  * grouped by customer replaces a (basket × hash-width)-row join
  * feeding a 36M-probe hash aggregate with one array-state aggregate
  * over basket-sized rows. Integer addition is associative and
  * commutative, so partial buffers merge map-side like any builtin
  * and the result is bit-identical to the per-(cust, h) `sum(q*r)`
  * formulation regardless of row order.
  *
  * Empty groups yield an empty vector; mismatched lengths throw (a
  * corpus invariant violation, not a recoverable state).
  */
final case class VectorSumLongBuf(sums: Array[Long])

object VectorSumLong extends Aggregator[Array[Long], VectorSumLongBuf, Array[Long]] {

  override def zero: VectorSumLongBuf = VectorSumLongBuf(Array.emptyLongArray)

  override def reduce(b: VectorSumLongBuf, v: Array[Long]): VectorSumLongBuf = {
    if (b.sums.isEmpty) VectorSumLongBuf(v.clone())
    else {
      require(b.sums.length == v.length, s"vector length ${v.length} != ${b.sums.length}")
      val s = b.sums
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VectorSumLongBuf(s)
    }
  }

  override def merge(a: VectorSumLongBuf, b: VectorSumLongBuf): VectorSumLongBuf =
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      require(a.sums.length == b.sums.length, "buffer length mismatch")
      val s = a.sums
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VectorSumLongBuf(s)
    }

  override def finish(b: VectorSumLongBuf): Array[Long] = b.sums

  override def bufferEncoder: Encoder[VectorSumLongBuf] = Encoders.product[VectorSumLongBuf]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
