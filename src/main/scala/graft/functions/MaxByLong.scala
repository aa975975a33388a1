package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CreateNamedStruct, Expression, GreaterThan, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** `max_by_longs(ord, v1, v2, …)` — MULTI-COLUMN argmax as a native
  * declarative aggregate with a FLAT buffer of longs.
  *
  * Why it exists: Spark's builtin `max_by` hash-aggregates fine for a
  * primitive value, but a multi-column champion forces
  * `max_by(struct(...), ord)` — and struct aggregation buffers are not
  * hash-aggregable, so the plan silently degrades to SortAggregate,
  * sorting every partition by the grouping key (measured in the CDC
  * operator; CdcSpec pins it, and the registered query dodges it by
  * bit-packing into one BIGINT — which caps the payload at 64 bits).
  * This aggregate keeps each champion column in its own flat long buffer
  * slot, so ANY number of champion columns rides whole-stage-codegen'd
  * HashAggregate with map-side partial aggregation, no packing, no caps.
  * Ties (equal ord) keep the first-seen row, the builtin's contract.
  * Returns a struct (v1, …, vn); null-ord rows are ignored.
  *
  * This is the fourth extension tier the engine exercises: scalar codegen
  * Expressions, optimizer rules, whole physical operators, and now
  * declarative aggregate functions.
  */
case class MaxByLongs(ord: Expression, values: Seq[Expression])
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = ord +: values
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(
    values.indices.map(i => StructField(s"v${i + 1}", LongType)))
  override def prettyName: String = "max_by_longs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (values.nonEmpty && children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint ord, bigint values...), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  private lazy val bufOrd = AttributeReference("maxby_ord", LongType)()
  private lazy val bufVals = values.indices
    .map(i => AttributeReference(s"maxby_v${i + 1}", LongType)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    bufOrd +: bufVals

  override lazy val initialValues: Seq[Expression] =
    aggBufferAttributes.map(_ => Literal.create(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(IsNull(bufOrd), GreaterThan(ord, bufOrd))
    def pick(incoming: Expression, kept: Expression): Expression =
      If(IsNull(ord), kept, If(better, incoming, kept))
    pick(ord, bufOrd) +: values.zip(bufVals).map { case (v, b) => pick(v, b) }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = Or(IsNull(bufOrd.left), GreaterThan(bufOrd.right, bufOrd.left))
    def pick(right: Expression, left: Expression): Expression =
      If(IsNull(bufOrd.right), left, If(better, right, left))
    pick(bufOrd.right, bufOrd.left) +:
      bufVals.map(b => pick(b.right, b.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufOrd),
      Literal.create(null, dataType),
      CreateNamedStruct(values.indices.flatMap(i =>
        Seq(Literal(s"v${i + 1}"), bufVals(i))).toSeq))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaxByLongs =
    copy(ord = newChildren.head, values = newChildren.tail.toSeq)
}
