package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Broadcast-shipped codebook expressions — the scale path for ANN
  * assignment that the literal-embedded forms
  * (`lit(cv)` per centroid in operators/Similarity.scala, `typedLit(book)`
  * per subspace in operators/Pq.scala) could not take: a literal codebook
  * makes the PLAN O(K·dim), which is fine at K=8/64 but blows up the
  * codegen'd literal arrays at the documented 100 TB shape (K ≈ √corpus).
  *
  * These expressions carry the codebook as a `Broadcast` handle instead —
  * constructor state, NOT a child expression — so the plan holds one
  * fixed-size reference per expression regardless of K, and executors
  * fetch the table once via torrent broadcast (the same shipping path a
  * broadcast join build side uses). Plan size is K-independent
  * (CodebookPlanSpec asserts it).
  *
  * Both expressions keep bit-identical arithmetic with the literal forms
  * they replace, so every oracle comparison is unaffected:
  *  - [[CosineRankCids]] reproduces `vec_dot`'s sequential left-fold over
  *    the min-length prefix, the engine-wide `floor(x·1e6+0.5)/1e6`
  *    rounding (functions/Rounding.scala), and the (sim DESC, cid ASC)
  *    comparator of the `array_sort` form it replaces.
  *  - [[PqAssign]] reproduces [[ArgMinSqDist]]'s packed
  *    `min_j(dist²·64 + j)` integer argmin, including the fail-fast on
  *    dimension mismatch, dispatching on the subspace index `m` instead of
  *    an M-way `when` chain over M literal codebooks.
  *
  * Codegen stays inside whole-stage codegen: the generated code makes one
  * virtual call per row into the compiled helper on a reference object —
  * the hot K×dim loop is compiled Scala, not interpreted expression trees.
  *
  * Because each instance closes over a per-query `Broadcast`, construction
  * goes through [[Codebooks]] + `GraftPlanBridge.column`, not the
  * `FunctionRegistry` (a registry builder cannot carry per-query state).
  */
case class CosineRankCids(
    left: Expression,
    right: Expression,
    bc: Broadcast[Array[(Array[Double], Double)]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, double), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine_rank_cids"
  // the codebook rides the broadcast, not the plan — the node prints O(1)
  override def toString: String = s"$prettyName($left, $right, bc=${bc.id})"

  @transient private lazy val table: Array[(Array[Double], Double)] = bc.value

  /** All K centroid ids ranked by (rounded cosine DESC, cid ASC) — the
    * exact order the literal `array_sort` form produced. Called from both
    * interpreted eval and the generated code. */
  def rankCids(a: ArrayData, nrm: Double): ArrayData = {
    val k = table.length
    val sims = new Array[Double](k)
    var j = 0
    while (j < k) {
      val (c, cn) = table(j)
      // vec_dot semantics: sequential left-fold over the min-length prefix
      val n = math.min(a.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * c(i); i += 1 }
      // roundN(x, 6): floor(x·1e6 + 0.5) / 1e6 — the engine-wide form
      sims(j) = math.floor(s / (nrm * cn) * 1e6 + 0.5) / 1e6
      j += 1
    }
    val cids = Array.range(0, k)
    // insertion sort on (sim DESC, cid ASC): k is codebook-sized and the
    // id array starts ordered, so this is O(k) when sims are near-sorted
    var p = 1
    while (p < k) {
      val id = cids(p)
      val sv = sims(id)
      var q = p - 1
      while (q >= 0 && sims(cids(q)) < sv) { cids(q + 1) = cids(q); q -= 1 }
      cids(q + 1) = id
      p += 1
    }
    new GenericArrayData(cids)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    rankCids(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val ref = ctx.addReferenceObj("cosRank", this, classOf[CosineRankCids].getName)
      s"${ev.value} = $ref.rankCids($a, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineRankCids =
    copy(left = newLeft, right = newRight)
}

/** Packed squared-L2 argmin against subspace `m`'s codebook — the
  * broadcast-dispatch form of the `when(m === 0, vec_argmin_sqdist(st,
  * lit(book₀))) … ` chain. Returns `min_j(dist²(st, book_m(j))·64 + j)`,
  * exactly [[ArgMinSqDist]]'s packing (≤64 codewords per subspace; callers
  * unpack with `pmod(x, 64)`). */
case class PqAssign(
    left: Expression,
    right: Expression,
    bc: Broadcast[Array[Array[Array[Long]]]]) extends BinaryExpression {

  private val MaxK = 64

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, array<bigint>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_assign"
  override def toString: String = s"$prettyName($left, $right, bc=${bc.id})"

  @transient private lazy val books: Array[Array[Array[Long]]] = bc.value

  def assign(m: Int, st: ArrayData): Long = {
    require(m >= 0 && m < books.length,
      s"$prettyName: subspace $m outside 0..${books.length - 1}")
    val book = books(m)
    require(book.length > 0 && book.length <= MaxK,
      s"$prettyName supports 1..$MaxK codewords, got ${book.length}")
    var best = Long.MaxValue
    var j = 0
    while (j < book.length) {
      val c = book(j)
      // Dimension mismatches must fail fast, not yield a plausible-looking
      // argmin over a silently truncated prefix (ArgMinSqDist contract).
      if (st.numElements() != c.length)
        throw new IllegalArgumentException(
          s"$prettyName: subvector dim ${st.numElements()} != codeword dim ${c.length}")
      var d = 0L
      var i = 0
      while (i < c.length) { val e = st.getLong(i) - c(i); d += e * e; i += 1 }
      val p = d * MaxK + j
      if (p < best) best = p
      j += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    assign(a.asInstanceOf[Int], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, st) => {
      val ref = ctx.addReferenceObj("pqAssign", this, classOf[PqAssign].getName)
      s"${ev.value} = $ref.assign($m, $st);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}

/** Column-level constructors (the `FunctionRegistry` cannot build
  * broadcast-carrying expressions — see the class scaladoc). */
object Codebooks {
  def cosineRankCids(v: Column, nrm: Column,
      bc: Broadcast[Array[(Array[Double], Double)]]): Column =
    GraftPlanBridge.column(CosineRankCids(
      GraftPlanBridge.expression(v), GraftPlanBridge.expression(nrm), bc))

  def pqAssign(m: Column, st: Column,
      bc: Broadcast[Array[Array[Array[Long]]]]): Column =
    GraftPlanBridge.column(PqAssign(
      GraftPlanBridge.expression(m), GraftPlanBridge.expression(st), bc))
}
