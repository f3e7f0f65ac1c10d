package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType, NullType, StructType}

/** Shared typing/ordering plumbing for the sorted-merge intersection
  * pair below: both operands must be arrays of the SAME orderable
  * atomic element type. `array<bigint>` gets a primitive fast path
  * (zero boxing in both eval and codegen); every other atomic type
  * (string ids included — the co-actor fixtures use names) rides the
  * same two-pointer merge through the element type's ordering, still
  * inside whole-stage codegen via `ctx.genComp`. */
trait SortedMergeInputs { self: BinaryExpression =>

  protected def fnName: String

  /** Element type of both operands (valid only after type check). */
  protected lazy val elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  /** Either operand's schema admits NULL ELEMENTS. The internal
    * adjacency frames never do (collect aggregates declare
    * containsNull=false), but the SQL registration exposes the
    * functions to arbitrary inputs — those take the null-aware slow
    * path below, with `array_intersect` semantics: null elements sort
    * LAST (matching `array_sort`, the sortedness precondition's
    * canonical producer) and null == null is a match. */
  protected lazy val nullableElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  protected lazy val isLongFastPath: Boolean =
    elementType == LongType && !nullableElems
  protected lazy val isIntFastPath: Boolean =
    elementType == IntegerType && !nullableElems

  /** Three-way compare with nulls-last (`array_sort`'s order):
    * -1/0/1, null > every value, null == null. */
  protected def nullAwareCompare(x: ArrayData, i: Int,
                                 y: ArrayData, j: Int): Int = {
    val xn = x.isNullAt(i); val yn = y.isNullAt(j)
    if (xn && yn) 0
    else if (xn) 1
    else if (yn) -1
    else elemOrdering.compare(x.get(i, elementType), y.get(j, elementType))
  }

  @transient protected lazy val elemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  private def isOrderableAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | NullType => false
    case other => RowOrdering.isOrderable(other)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && isOrderableAtomic(l) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$fnName expects two arrays of the same orderable atomic " +
            s"element type, got ${left.dataType.simpleString} and " +
            s"${right.dataType.simpleString}")
    }
}

/** Codegen'd merge-intersection over two SORTED atomic-element
  * arrays — the triangle-family hot path.
  *
  * `array_intersect` is correct here but allocates per ROW: it builds
  * a hash set over one side and materializes the intersection array,
  * and the triangle/coefficient queries evaluate it once per oriented
  * EDGE (1.2×10⁸ rows at the 100× bench step, ~80-element
  * neighborhoods). With both adjacency arrays built sorted
  * (`array_sort` costs one 80-element sort per VERTEX, not per edge),
  * the intersection is a two-pointer merge: O(|a|+|b|) comparisons,
  * zero allocation for the count form, and the whole expression stays
  * inside whole-stage codegen. `array<bigint>` compares primitive
  * longs; other atomic types (e.g. string node ids) compare through
  * `ctx.genComp`, still codegen'd.
  *
  * SORTEDNESS IS A PRECONDITION, not checked at runtime (a per-row
  * check would cost the merge itself): both callers build their
  * arrays with `array_sort`, and `SortedIntersectSpec` pins the merge
  * against `array_intersect` on the same inputs (plus an
  * unsorted-input negative documenting the precondition). Inputs are
  * treated as SETS (duplicate-free), which adjacency lists of a
  * DISTINCT edge frame are by construction.
  *
  * NULL ELEMENTS (round-15, the SQL-registration hardening): when
  * either input schema has `containsNull=true` the merge takes a
  * null-aware slow path with `array_intersect` semantics — null
  * elements sort LAST (matching `array_sort`, the canonical producer
  * of the sortedness precondition) and null == null is a match. The
  * internal adjacency frames are containsNull=false, so the hot path
  * is untouched.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with SortedMergeInputs {

  override protected def fnName: String = "sorted_intersect_count"

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    if (isLongFastPath) {
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else if (isIntFastPath) {
      while (i < nx && j < ny) {
        val xv = x.getInt(i); val yv = y.getInt(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      // generic ordering path; null-aware when the schema admits null
      // elements (nulls-last, null == null — array_intersect parity)
      while (i < nx && j < ny) {
        val cmp = nullAwareCompare(x, i, y, j)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** Public codegen entry for the null-aware slow path (the fast
    * paths inline their own generated loops). */
  def mergeEval(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (nullableElems) {
      // null-element inputs (SQL-facing only): route through the
      // interpreted null-aware merge via a reference object — the
      // CodegenFallback pattern, scoped to just this expression so
      // the enclosing stage stays codegen'd
      val ref = ctx.addReferenceObj("sortedIntersectCount", this)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ((java.lang.Long) $ref.mergeEval($a, $b)).longValue();")
    } else nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: several of these may land unbraced in one
      // generated scope (the DotProduct lesson)
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val jt = CodeGenerator.javaType(elementType)
      val getX = CodeGenerator.getValue(a, elementType, i)
      val getY = CodeGenerator.getValue(b, elementType, j)
      val cmp = ctx.freshName("cmp")
      val body = if (isLongFastPath)
        s"""
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
         """.stripMargin
      else
        s"""
           |  $jt $xv = $getX; $jt $yv = $getY;
           |  int $cmp = ${ctx.genComp(elementType, xv, yv)};
           |  if ($cmp == 0) { $c++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
         """.stripMargin
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |$body
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Array-returning sibling of [[SortedIntersectCount]] for the
  * clustering-coefficient path, which needs the closing vertices
  * themselves (exploded into per-vertex triangle counts). Same
  * two-pointer merge; allocates exactly the result (one bounded
  * buffer per row), never a hash set. Output is sorted ascending in
  * the element type's ordering (= input order, inputs being sorted). */
case class SortedIntersect(left: Expression, right: Expression)
  extends BinaryExpression with SortedMergeInputs {

  override protected def fnName: String = "sorted_intersect"

  override def dataType: DataType =
    ArrayType(elementType, containsNull = nullableElems)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    if (isLongFastPath) {
      val buf = new Array[Long](math.min(nx, ny))
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { buf(c) = xv; c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(buf, c))
    } else if (isIntFastPath) {
      val buf = new Array[Int](math.min(nx, ny))
      while (i < nx && j < ny) {
        val xv = x.getInt(i); val yv = y.getInt(j)
        if (xv == yv) { buf(c) = xv; c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(buf, c))
    } else {
      // generic ordering path; null-aware when the schema admits null
      // elements (nulls-last, null == null — array_intersect parity)
      val buf = new Array[AnyRef](math.min(nx, ny))
      while (i < nx && j < ny) {
        val cmp = nullAwareCompare(x, i, y, j)
        if (cmp == 0) {
          buf(c) = if (x.isNullAt(i)) null
                   else x.get(i, elementType).asInstanceOf[AnyRef]
          c += 1; i += 1; j += 1
        }
        else if (cmp < 0) i += 1
        else j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(buf, c))
    }
  }

  /** Public codegen entry for the null-aware slow path (the fast
    * paths inline their own generated loops). */
  def mergeEval(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (nullableElems) {
      // null-element inputs (SQL-facing only): interpreted null-aware
      // merge via a reference object, scoped to this expression
      val ref = ctx.addReferenceObj("sortedIntersect", this)
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ($ad) $ref.mergeEval($a, $b);")
    } else nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      if (isLongFastPath)
        s"""
           |int $nx = $a.numElements(); int $ny = $b.numElements();
           |long[] $buf = new long[java.lang.Math.min($nx, $ny)];
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $nx && $j < $ny) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $buf[$c++] = $xv; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = new $gad(java.util.Arrays.copyOf($buf, $c));
         """.stripMargin
      else if (isIntFastPath)
        s"""
           |int $nx = $a.numElements(); int $ny = $b.numElements();
           |int[] $buf = new int[java.lang.Math.min($nx, $ny)];
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $nx && $j < $ny) {
           |  int $xv = $a.getInt($i); int $yv = $b.getInt($j);
           |  if ($xv == $yv) { $buf[$c++] = $xv; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = new $gad(java.util.Arrays.copyOf($buf, $c));
         """.stripMargin
      else {
        val jt = CodeGenerator.javaType(elementType)
        val getX = CodeGenerator.getValue(a, elementType, i)
        val getY = CodeGenerator.getValue(b, elementType, j)
        val cmp = ctx.freshName("cmp")
        s"""
           |int $nx = $a.numElements(); int $ny = $b.numElements();
           |Object[] $buf = new Object[java.lang.Math.min($nx, $ny)];
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $nx && $j < $ny) {
           |  $jt $xv = $getX; $jt $yv = $getY;
           |  int $cmp = ${ctx.genComp(elementType, xv, yv)};
           |  if ($cmp == 0) { $buf[$c++] = $xv; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}
           |${ev.value} = new $gad(java.util.Arrays.copyOf($buf, $c));
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraphExpressions {
  /** |a ∩ b| over two sorted duplicate-free same-atomic-type array
    * columns (primitive fast path for `array<bigint>`). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(SortedIntersectCount(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** a ∩ b (sorted ascending) over two sorted duplicate-free
    * same-atomic-type array columns. */
  def sorted_intersect(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(SortedIntersect(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
