package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** 60-bit SimHash of a token array (Charikar 2002) built from
  * ENGINE-PORTABLE token hashes: two polynomial hashes over the
  * token's bytes, `h1 = Σ byte·131^i mod 1e9+7` and
  * `h2 = Σ byte·137^i mod 998244353`, supply bits 0–29 and 30–59 of
  * the per-token signature. Bit b of the result is 1 iff the sum over
  * tokens of (+1 if signature bit b set, else −1) is positive.
  *
  * The point of the polynomial hashes is that ANY SQL engine can
  * recompute them exactly (a fold of `(acc*base + byte) % prime` —
  * every intermediate stays < 2^63), so a sketch-dependent result can
  * be verified cross-engine row-for-row, where an xxhash64-based
  * sketch ([[SimHash64]]) is checkable only by trusting this engine.
  * Keep [[SimHash64]] for throughput when portability doesn't matter:
  * xxh64 consumes 8 bytes per step versus this hash's
  * two-multiplies-two-mods per byte.
  *
  * Bytes are the token's UTF-8 encoding; for ASCII text (this
  * corpus) they coincide with code points, which is what a SQL
  * oracle's `ord()` folds over. Null tokens are skipped; a null
  * array yields null. Empty tokens hash to 0 in both engines.
  */
case class SimHash60Portable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var h1 = 0L
        var h2 = 0L
        var j = 0
        val nb = s.numBytes
        while (j < nb) {
          val b = s.getByte(j) & 0xFF
          h1 = (h1 * 131 + b) % 1000000007L
          h2 = (h2 * 137 + b) % 998244353L
          j += 1
        }
        var bit = 0
        while (bit < 30) {
          if (((h1 >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          if (((h2 >>> bit) & 1L) == 1L) counts(bit + 30) += 1
          else counts(bit + 30) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = classOf[org.apache.spark.unsafe.types.UTF8String].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bit = ctx.freshName("bit")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val nb = ctx.freshName("nb")
      val by = ctx.freshName("by")
      s"""
         |final int[] $counts = new int[60];
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final $utf8 $s = $arr.getUTF8String($i);
         |    long $h1 = 0L; long $h2 = 0L;
         |    final int $nb = $s.numBytes();
         |    for (int $j = 0; $j < $nb; $j++) {
         |      final int $by = $s.getByte($j) & 0xFF;
         |      $h1 = ($h1 * 131L + $by) % 1000000007L;
         |      $h2 = ($h2 * 137L + $by) % 998244353L;
         |    }
         |    for (int $bit = 0; $bit < 30; $bit++) {
         |      if ((($h1 >>> $bit) & 1L) == 1L) $counts[$bit]++; else $counts[$bit]--;
         |      if ((($h2 >>> $bit) & 1L) == 1L) $counts[$bit + 30]++; else $counts[$bit + 30]--;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $bit = 0; $bit < 60; $bit++) {
         |  if ($counts[$bit] > 0) ${ev.value} |= (1L << $bit);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60Portable {

  def simhash60(col: Column): Column =
    GraftShim.column(SimHash60Portable(GraftShim.expression(col)))
}
