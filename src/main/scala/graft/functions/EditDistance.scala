package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) bounded edit distance: is levenshtein(a, b) ≤ k?
  *
  * The full Wagner-Fischer DP is O(n·m) per pair; inside a fuzzy-join's
  * candidate gate that cost dominates. The banded form fills only the
  * diagonal band of width 2k+1 — O(k·n) — and EXITS as soon as a whole
  * band row exceeds k (most non-matches die in the first rows). Same
  * decision as `levenshtein(a, b) <= k` on every input
  * (EditDistanceSpec cross-checks against the builtin exhaustively).
  */
object EditDistanceUtil {

  /** True iff edit distance ≤ k. Codegen calls this static-style method
    * directly — one invocation per row, no lambda dispatch. */
  def within(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    if (k < 0) return false
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return false
    if (n == 0) return m <= k
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(0) = if (i <= k) i else inf
      var rowMin = cur(0)
      // cells left of the band are implicitly inf
      if (lo > 1) cur(lo - 1) = inf
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin >= inf) return false // whole band over budget: early exit
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m) <= k
  }
}

/** `lev_within(str, str, k)` → boolean. Null-intolerant; k must be a
  * non-negative int (typically a literal — the fuzzy-join threshold). */
case class LevWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lev_within"

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    EditDistanceUtil.within(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.EditDistanceUtil.within($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LevWithin =
    copy(first = newFirst, second = newSecond, third = newThird)
}
