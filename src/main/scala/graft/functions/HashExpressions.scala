package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd salted 32-bit MD5 hash: `md5(prefix ++ value)` read
  * directly as an unsigned 32-bit big-endian int at byte `offset`.
  *
  * Semantically IDENTICAL to the built-in composition
  * `conv(substring(md5(concat(lit(prefix), c)), 8*offset/4+1, 8), 16, 10)`
  * (the first 8 hex chars ARE the first 4 digest bytes big-endian) —
  * pinned by a bit-equality spec — but skips the 32-char hex string
  * materialization, the substring copy, and the base-16 reparse that
  * the built-in path pays PER ROW. The dedup/fingerprint operators
  * evaluate this on every shingle (millions per document batch), so
  * the saved allocations are the hot path. The digest instance is
  * thread-local: one per executor thread, not one per row.
  *
  * DuckDB oracles are unchanged — the hex-substring formulation there
  * produces the same values by construction.
  */
case class Md5Int32(child: Expression, prefix: String, offset: Int)
  extends UnaryExpression {

  // a 4-byte read of the 16-byte digest needs offset in [0, 12]; fail
  // at construction on EVERY entry point (the SQL registry validated
  // this, but the Scala constructors would have failed per-row with
  // ArrayIndexOutOfBoundsException at execution)
  require(offset >= 0 && offset <= 12,
    s"md5_i32 offset must be in [0, 12], got $offset")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_i32 expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Int32.hash(prefix, offset, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("md5prefix", prefix, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Int32.hash($pref, $offset, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd md5 WORD PAIR: one digest per value, both 32-bit words
  * out as `struct<a: long, b: long>` (big-endian bytes [0,4) and
  * [4,8), the same words [[Md5Int32]] reads at offsets 0 and 4).
  *
  * The MinHash affine family and the hashed n-gram posting keys both
  * need the A AND B words of the SAME digest; as two separate
  * [[Md5Int32]] calls each row pays the digest twice (subexpression
  * elimination cannot merge them — the digest is not an expression
  * node). This computes it once: the consumers `select(p.a, p.b)` and
  * the struct never leaves the projection. DuckDB oracles unchanged
  * (`md5PairASql` / `md5PairBSql` read the same hex words).
  */
case class Md5Pair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_pair expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = Md5Pair.structType

  override def nullSafeEval(s: Any): Any =
    Md5Pair.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Pair.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Pair {
  import org.apache.spark.sql.types.{StructField, StructType}

  val structType: StructType =
    StructType(Seq(StructField("a", LongType, nullable = false),
                   StructField("b", LongType, nullable = false)))

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** ONE digest, both unsigned 32-bit big-endian words. */
  def hash(value: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val md = digests.get()
    md.reset()
    md.update(value.getBytes)
    val d = md.digest()
    def word(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](word(0), word(4)))
  }

  /** Column-level entry point. */
  def md5_pair(c: Column): Column =
    GraftSqlBridge.toColumn(Md5Pair(GraftSqlBridge.toExpression(c)))
}

/** Codegen'd word n-gram shingling over an `array<string>` column:
  * element i of the output is `arr[i] ++ " " ++ … ++ arr[i+n-1]`, in
  * order, duplicates kept; fewer than n tokens ⇒ empty array.
  *
  * Semantically IDENTICAL to the higher-order-function formulation
  * (`transform(sequence(…), i => array_join(slice(…), " "))`) — spec-
  * pinned — but higher-order functions are CodegenFallback: every
  * shingle paid interpreted lambda dispatch plus a slice copy and a
  * generic array_join. One document yields hundreds of shingles and
  * the dedup/fingerprint operators shingle every document, so this is
  * the hottest scalar loop in the library. Here it is one
  * `UTF8String.concatWs` per shingle inside whole-stage codegen.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    Shingles.evalShingles(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.evalShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  // named evalShingles, NOT eval: the case class inherits
  // Expression.eval, and the name clash makes scalac skip the static
  // forwarder the generated Java source calls — janino then rejects
  // the stage and Spark silently de-codegens it (caught by the
  // codegen-engagement spec)
  def evalShingles(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = arr.numElements()
    val out = new Array[AnyRef](math.max(0, len - n + 1))
    var i = 0
    while (i < out.length) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column-level entry point. */
  def shingles_expr(toks: Column, n: Int): Column =
    GraftSqlBridge.toColumn(Shingles(GraftSqlBridge.toExpression(toks), n))
}

/** Codegen'd count of exact matches of a CONSTANT term in an
  * `array<string>` column: `count_token_eq(tk, t)` ==
  * `size(filter(tk, x -> x = t))` (spec-pinned bit equality, null
  * elements never match — the same rows the HOF's null-propagating
  * predicate drops).
  *
  * Why it exists: higher-order functions are `CodegenFallback`, so
  * the BM25 scorer's per-term tf — the hottest projection of a
  * retrieval query, |q| array scans over EVERY corpus row — paid
  * interpreted lambda dispatch per array element. Here each scan is
  * a tight `UTF8String.equals` loop inside whole-stage codegen (the
  * [[Shingles]]/[[Md5Int32]] discipline). DuckDB oracles keep the
  * `list_filter` formulation — same values by construction.
  */
case class CountTokenEq(child: Expression, term: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_token_eq expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val termUtf8 = UTF8String.fromString(term)

  override def nullSafeEval(a: Any): Any =
    CountTokenEq.countEq(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], termUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the term rides as a pre-built UTF8String reference object — no
    // per-row string conversion, the loop compares raw bytes
    val t = ctx.addReferenceObj("cteTerm", UTF8String.fromString(term),
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountTokenEq.countEq($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountTokenEq {
  /** Matches per element; null elements never match (HOF parity —
    * `x = t` is null there and filter drops it). */
  def countEq(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              term: UTF8String): Long = {
    val n = arr.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).equals(term)) c += 1
      i += 1
    }
    c
  }

  /** Column-level entry point. */
  def count_token_eq(toks: Column, term: String): Column =
    GraftSqlBridge.toColumn(
      CountTokenEq(GraftSqlBridge.toExpression(toks), term))
}

object Md5Int32 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Unsigned 32-bit big-endian read of digest bytes [offset, offset+4). */
  def hash(prefix: String, offset: Int, value: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    if (prefix.nonEmpty) md.update(prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(value.getBytes)
    val d = md.digest()
    ((d(offset) & 0xffL) << 24) | ((d(offset + 1) & 0xffL) << 16) |
      ((d(offset + 2) & 0xffL) << 8) | (d(offset + 3) & 0xffL)
  }

  /** Column-level entry point. */
  def md5_i32(c: Column, prefix: String, offset: Int = 0): Column =
    GraftSqlBridge.toColumn(Md5Int32(GraftSqlBridge.toExpression(c), prefix, offset))
}
