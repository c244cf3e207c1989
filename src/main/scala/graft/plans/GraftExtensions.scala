package graft.plans

import graft.functions.{DecodeLongArrayToUtf8, DotProductDouble, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst session extensions for the graft engine:
  *
  *  - [[RewriteDotProduct]], an optimizer rule that recognizes the
  *    declarative dot-product idiom
  *    `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
  *    and replaces it with the fused native
  *    [[graft.functions.DotProductDouble]] loop — users writing plain
  *    builtin compositions get the codegen'd kernel for free, the same
  *    fold order bit-for-bit.
  *  - SQL registration of the engine's native functions
  *    (`dot_product`, `simhash64`, `minhash_signature`,
  *    `decode_byte_array`) so the pure-SQL surface reaches them too.
  *
  * Activate cluster-wide with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`, or on a
  * live session with [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectOptimizerRule(_ => RewriteLevenshteinThreshold)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
         new ExpressionInfo("graft.functions", name),
         builder))
    }
  }
}

object GraftExtensions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { es => DotProductDouble(es.head, es(1)) },
    "simhash64" -> { es => SimHash64(es.head) },
    "simhash60" -> { es => graft.functions.SimHash60Portable(es.head) },
    "minhash_signature" -> { es =>
      MinHashSignature(
        es.head,
        es(1).eval().asInstanceOf[Number].intValue)
    },
    "decode_byte_array" -> { es => DecodeLongArrayToUtf8(es.head) },
    "word_ngrams" -> { es =>
      graft.functions.WordNgrams(
        es.head,
        es(1).eval().asInstanceOf[Number].intValue)
    },
    "sorted_intersect_count" -> { es =>
      graft.functions.SortedArrayIntersectCount(es.head, es(1))
    },
    "mean_threshold_bits" -> { es =>
      graft.functions.MeanThresholdBits(
        es.head,
        es(1).eval().asInstanceOf[Number].intValue)
    },
    "md5hex32" -> { es => graft.functions.Md5Hex32(es.head) },
    "md5_lanes" -> { es =>
      graft.functions.Md5Lanes(
        es.head,
        es(1).eval().asInstanceOf[Number].intValue)
    },
    "md5_sign_vector" -> { es => graft.functions.Md5SignVector(es.head, es(1)) }
  )

  /** Install on an already-built session: the rewrite rule goes into
    * `experimental.extraOptimizations` (the sanctioned post-hoc hook),
    * functions into the session registry.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
    if (!spark.experimental.extraOptimizations.contains(RewriteLevenshteinThreshold))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteLevenshteinThreshold
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `levenshtein(a, b) <= k` / `< k` / `>= k` / `> k` (constant
  * non-negative k, no threshold) → the THRESHOLD levenshtein
  * compared against −1's semantics: the banded DP does O(k·n) work
  * with early exit instead of filling the full O(n·m) matrix, and
  * the predicate's truth value is unchanged (`levenshtein(a, b, k)`
  * returns the true distance when ≤ k and −1 otherwise, so
  * `dist <= k ⟺ threshold-form ≠ −1`). Users write the naive
  * predicate; every edit-distance filter in the plan gets the banded
  * kernel for free — the same contract as [[RewriteDotProduct]].
  */
object RewriteLevenshteinThreshold extends Rule[LogicalPlan] {

  private def constK(e: Expression): Option[Int] = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) if v >= 0 => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= k  ⟺  lev(a,b,k) != -1
      case LessThanOrEqual(Levenshtein(a, b, None), kl @ Literal(_, _))
          if constK(kl).isDefined =>
        Not(EqualTo(Levenshtein(a, b, Some(kl)), Literal(-1)))
      // dist < k (k ≥ 1)  ⟺  lev(a,b,k-1) != -1
      case LessThan(Levenshtein(a, b, None), kl @ Literal(_, _))
          if constK(kl).exists(_ >= 1) =>
        Not(
          EqualTo(
            Levenshtein(a, b, Some(Literal(constK(kl).get - 1))),
            Literal(-1)))
      // dist > k  ⟺  lev(a,b,k) == -1
      case GreaterThan(Levenshtein(a, b, None), kl @ Literal(_, _))
          if constK(kl).isDefined =>
        EqualTo(Levenshtein(a, b, Some(kl)), Literal(-1))
      // dist >= k (k ≥ 1)  ⟺  lev(a,b,k-1) == -1
      case GreaterThanOrEqual(Levenshtein(a, b, None), kl @ Literal(_, _))
          if constK(kl).exists(_ >= 1) =>
        EqualTo(
          Levenshtein(a, b, Some(Literal(constK(kl).get - 1))),
          Literal(-1))
    }
}

/** `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * over `array<double>` → [[DotProductDouble]] — identical semantics
  * (left fold, null on null/length-mismatch input) in one fused loop.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(
              a,
              b,
              LambdaFunction(
                Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xd: NamedLambdaVariable, yd: NamedLambdaVariable),
                _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(accd: NamedLambdaVariable, vd: NamedLambdaVariable),
              _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(find: NamedLambdaVariable), _))
          if zero == 0.0 &&
            x.exprId == xd.exprId && y.exprId == yd.exprId &&
            acc.exprId == accd.exprId && v.exprId == vd.exprId &&
            fin.exprId == find.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        DotProductDouble(a, b)
    }
}
