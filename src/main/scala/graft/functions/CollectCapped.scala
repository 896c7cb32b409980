package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}

/** `collect_capped(expr, cap)` — collect_list with a hard buffer bound:
  * the group's values are gathered until `cap` is exceeded, at which
  * point the group is marked overflowed (no further buffering) and
  * evaluates to NULL.
  *
  * Why this exists (SURVEY §2.12 custom-Expression tier): the n-gram
  * Jaccard candidate generator groups postings by shingle hash and
  * pair-generates within each bucket — quadratic in bucket size, so a
  * boilerplate shingle shared by 1M documents must be DROPPED, not
  * paired. Built-in collect_list would buffer the full 1M-row bucket
  * before any filter could discard it, so the previous shape spent a
  * whole extra aggregation pass (per-shingle document frequency) plus a
  * broadcast anti-join just to remove hot shingles before buffering.
  * This aggregate enforces the same ≤ cap×entry bound INSIDE the bucket
  * aggregation: one shuffle does frequency capping and bucket building,
  * and the hot-shingle pass disappears. Overflowed groups stop
  * accumulating on update AND on merge, so neither the map-side partial
  * nor the reducer ever holds more than cap+1 entries per group.
  *
  * NULL result (not an empty array) distinguishes "dropped for heat"
  * from "genuinely small"; callers filter `isNotNull`. Input NULLs are
  * skipped, matching collect_list.
  */
final case class CollectCapped(
    child: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCapped.Buffer] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = child.nullable)
  override def prettyName: String = "collect_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!capExpr.foldable || capExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT cap, got " +
          capExpr.dataType.simpleString)
    else if (capExpr.eval() == null ||
        capExpr.eval().asInstanceOf[Number].intValue < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName cap must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): CollectCapped.Buffer =
    new CollectCapped.Buffer(new ArrayBuffer[Any], overflowed = false)

  override def update(buf: CollectCapped.Buffer,
      input: InternalRow): CollectCapped.Buffer = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        if (buf.items.length >= cap) { buf.overflowed = true; buf.items.clear() }
        else buf.items += InternalRow.copyValue(v)
      }
    }
    buf
  }

  override def merge(a: CollectCapped.Buffer,
      b: CollectCapped.Buffer): CollectCapped.Buffer = {
    if (a.overflowed || b.overflowed ||
        a.items.length + b.items.length > cap) {
      a.overflowed = true; a.items.clear()
    } else a.items ++= b.items
    a
  }

  override def eval(buf: CollectCapped.Buffer): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.items.toArray)

  // Shuffle format: one UnsafeRow of (overflowed: boolean,
  // items: array<childType>) — the same trick Spark's own Collect uses,
  // so arbitrary child types (structs included) serialize correctly.
  private lazy val proj = UnsafeProjection.create(Array[DataType](
    BooleanType, ArrayType(child.dataType, containsNull = child.nullable)))

  override def serialize(buf: CollectCapped.Buffer): Array[Byte] =
    proj.apply(InternalRow(buf.overflowed,
      new GenericArrayData(buf.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): CollectCapped.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    if (row.getBoolean(0))
      new CollectCapped.Buffer(new ArrayBuffer[Any], overflowed = true)
    else {
      val arr = row.getArray(1)
      val items = new ArrayBuffer[Any](arr.numElements())
      var i = 0
      while (i < arr.numElements()) {
        items += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
      new CollectCapped.Buffer(items, overflowed = false)
    }
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

object CollectCapped {
  final class Buffer(val items: ArrayBuffer[Any], var overflowed: Boolean)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("collect_capped"),
      new ExpressionInfo(classOf[CollectCapped].getName, "collect_capped"),
      (exprs: Seq[Expression]) => {
        // a clear signature error instead of IndexOutOfBounds from the
        // positional access below
        require(exprs.length == 2,
          s"collect_capped(expr, cap) takes 2 arguments, got ${exprs.length}")
        CollectCapped(exprs(0), exprs(1))
      })
  }
}
