package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued generator (the UDTF tier of the extension
  * surface): one output row per word n-gram of a token array —
  * `explode`'s shape with domain semantics, completing the
  * UDF (scalar expressions) / UDAF ([[graft.ops.Similarity]]'s
  * VectorMean) / UDTF triad.
  *
  * Equivalent builtin pipeline:
  * `explode(transform(sequence(1, size(t) - n + 1),
  * i -> array_join(slice(t, i, n), ' ')))` — which materializes an
  * index array, slices a fresh array per window, and (without a
  * Generate barrier, see t7) risks CollapseProject re-evaluating the
  * token split per window. The generator streams windows straight off
  * the token `ArrayData` with one `concatWs` allocation per n-gram
  * and no intermediate arrays, and — being a Generate node — is
  * immune to projection collapse by construction.
  *
  * Null tokens render as empty strings (matching `array_join`
  * semantics); a null / too-short array generates zero rows, matching
  * `explode` of an empty transform result.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  require(n >= 1, "ngram width must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects array<string>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Iterator.empty
    val toks = value.asInstanceOf[ArrayData]
    val windows = toks.numElements() - (n - 1)
    if (windows <= 0) return Iterator.empty
    val sep = UTF8String.fromString(" ")
    val empty = UTF8String.EMPTY_UTF8
    Iterator.tabulate(windows) { i =>
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        parts(j) = if (t == null) empty else t
        j += 1
      }
      InternalRow(UTF8String.concatWs(sep, parts: _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  /** DataFrame-API surface: `wordNgrams(col("toks"), 8).as("sh")`. */
  def wordNgrams(tokens: Column, n: Int): Column =
    GraftShim.column(WordNgrams(GraftShim.expression(tokens), n))
}
