package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Packed argmin of squared L2 distance from an `array<bigint>` vector to a
  * FOLDABLE `array<array<bigint>>` centroid table: returns
  * `min_j(dist²(v, c_j) * 64 + j)` — distance in the high bits, winning
  * index in the low 6 (so ≤ 64 centroids; ties break to the lower index
  * automatically).
  *
  * This is the k-means / IVF assignment inner loop (operators/KMeans.scala).
  * The composable form — k separate `aggregate(zip_with(...))` columns fed
  * into `least(...)` — evaluates every lambda INTERPRETED (higher-order
  * functions don't join whole-stage codegen), i.e. k×Dim boxed steps per
  * row. Here the centroid literal is materialized ONCE into a compiled
  * `long[][]` reference and the generated code is the tight two-level loop
  * a native engine would emit. Same exact integer arithmetic, so results
  * are bit-identical to the HOF form.
  *
  * The centroid argument must be foldable: the table is driver-state by
  * definition (k×Dim longs); a non-literal right side is a type error, not
  * a slow path.
  */
case class ArgMinSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private val MaxK = 64

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      if (!right.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) centroid table")
      else TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_argmin_sqdist"

  /** The centroid table, decoded once per task (and once per query plan in
    * codegen, via a compiled reference object). */
  @transient private lazy val centroids: Array[Array[Long]] = {
    val v = right.eval(null).asInstanceOf[ArrayData]
    require(v.numElements() > 0 && v.numElements() <= MaxK,
      s"$prettyName supports 1..$MaxK centroids, got ${v.numElements()}")
    Array.tabulate(v.numElements())(j => v.getArray(j).toLongArray())
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      // Dimension mismatches must fail fast, not yield a plausible-looking
      // argmin over a silently truncated prefix.
      if (x.numElements() != c.length)
        throw new IllegalArgumentException(
          s"$prettyName: vector dim ${x.numElements()} != centroid dim ${c.length}")
      var d = 0L
      var i = 0
      while (i < c.length) { val e = x.getLong(i) - c(i); d += e * e; i += 1 }
      val p = d * MaxK + j
      if (p < best) best = p
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val cents = ctx.addReferenceObj("centroids", centroids, "long[][]")
      val best = ctx.freshName("best")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      val p = ctx.freshName("p")
      s"""
         |long $best = Long.MAX_VALUE;
         |for (int $j = 0; $j < $cents.length; $j++) {
         |  final long[] $c = $cents[$j];
         |  if ($a.numElements() != $c.length) {
         |    throw new IllegalArgumentException(
         |      "vec_argmin_sqdist: vector dim " + $a.numElements() +
         |      " != centroid dim " + $c.length);
         |  }
         |  final int $n = $c.length;
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $e = $a.getLong($i) - $c[$i];
         |    $d += $e * $e;
         |  }
         |  final long $p = $d * ${MaxK}L + $j;
         |  if ($p < $best) $best = $p;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinSqDist =
    copy(left = newLeft, right = newRight)
}
