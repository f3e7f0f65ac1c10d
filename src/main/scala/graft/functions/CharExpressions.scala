package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character n-grams straight off the UTF8String bytes:
  * element i of the output is code points i..i+n-1 of the input
  * joined by a single space — exactly
  * `shingles(slice(split(s, ''), 1, length(s)), n)` (spec-pinned),
  * the char-stream formulation [[graft.operators.CorpusQuality]]
  * used for `llm_char_entropy` / `llm_langid_chargram`.
  *
  * Why it exists: the composition pays, PER DOCUMENT, a regex split
  * into length(s)+1 one-character UTF8Strings (each a fresh object),
  * a slice copy of that array, and then one `concatWs` allocation per
  * shingle over it. Here one pass walks the UTF-8 lead bytes to find
  * code-point boundaries and emits each gram with a single
  * `arraycopy` — no regex engine, no per-character intermediate
  * strings, no slice. The two char-gram operators stream every
  * character of the corpus through this expression, so the saved
  * allocations are their hot path. DuckDB oracles are unchanged (the
  * per-char list comprehension there produces the same grams by
  * construction).
  *
  * Code-point semantics match the composition: Java's regex `split`
  * on the empty pattern never splits inside a surrogate pair and
  * `length()` counts code points, so both sides see one element per
  * code point. For n = 1 the output is the plain per-character list
  * (no separator), which is what the entropy operator explodes.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CharNgrams.evalGrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.evalGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {

  // named evalGrams, NOT eval — the Shingles static-forwarder lesson:
  // a name clash with Expression.eval makes scalac skip the forwarder
  // the generated Java calls and Spark silently de-codegens the stage
  def evalGrams(s: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // pass 1: code-point boundaries (UTF-8 lead-byte walk)
    var count = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    val outLen = math.max(0, count - n + 1)
    val out = new Array[AnyRef](outLen)
    if (outLen > 0) {
      val offsets = new Array[Int](count + 1)
      var c = 0
      i = 0
      while (i < nb) {
        offsets(c) = i
        c += 1
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
      offsets(count) = nb
      var k = 0
      while (k < outLen) {
        // always a fresh byte[] per gram: getBytes may alias the
        // scanner's reused row buffer, so a zero-copy view could be
        // overwritten after the row advances
        val gram = new Array[Byte](offsets(k + n) - offsets(k) + (n - 1))
        var p = 0
        var j = 0
        while (j < n) {
          if (j > 0) { gram(p) = ' '; p += 1 }
          val cs = offsets(k + j)
          val ce = offsets(k + j + 1)
          System.arraycopy(bytes, cs, gram, p, ce - cs)
          p += ce - cs
          j += 1
        }
        out(k) = UTF8String.fromBytes(gram)
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column-level entry point. */
  def char_ngrams(c: Column, n: Int): Column =
    GraftSqlBridge.toColumn(CharNgrams(GraftSqlBridge.toExpression(c), n))
}

/** Codegen'd word tokenizer: lower-cased maximal runs of
  * `[\p{L}\p{N}_]` code points, in order, duplicates kept — exactly
  * `regexp_extract_all(lower(c), "[\\p{L}\\p{N}_]+", 0)` (the
  * [[TextAnalysis.tokens]] contract, spec-pinned including Nl/No
  * numerals and full-case lowering like U+0130).
  *
  * Why it exists: that composition runs the Java regex engine over
  * every character of the corpus and allocates a Matcher + per-match
  * group strings PER ROW, and `tokens()` feeds ~70 call sites — the
  * single hottest scalar path in the library. Here lowering is the
  * SAME `UTF8String.toLowerCase` the `lower()` expression calls
  * (bit-identical), and the class test is the direct
  * `Character.isLetter / getType` classification the regex's Unicode
  * categories resolve to — one code-point walk, no automaton, no
  * Matcher. DuckDB oracles keep the regex formulation (RE2 and Java
  * agree on these classes; unchanged).
  */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_tokens expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WordTokens.evalTokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordTokens.evalTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordTokens {

  /** `[\p{L}\p{N}_]` per code point: \p{L} is exactly
    * Character.isLetter's five categories; \p{N} is Nd | Nl | No. */
  private def inClass(cp: Int): Boolean =
    Character.isLetter(cp) || cp == '_' || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  def evalTokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    // the SAME lowering lower() performs, then one code-point walk of
    // the lowered string (the regex also matched against exactly this
    // string)
    val str = s.toLowerCase.toString
    val n = str.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var i = 0
    var start = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      if (inClass(cp)) {
        if (start < 0) start = i
      } else if (start >= 0) {
        out += UTF8String.fromString(str.substring(start, i))
        start = -1
      }
      i += Character.charCount(cp)
    }
    if (start >= 0) out += UTF8String.fromString(str.substring(start))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Column-level entry point. */
  def word_tokens(c: Column): Column =
    GraftSqlBridge.toColumn(WordTokens(GraftSqlBridge.toExpression(c)))
}

/** Codegen'd per-document profile-hit counter: element k of the
  * output is the number of elements of the input `array<string>`
  * that belong to profile set k (duplicates counted — occurrence
  * counts, not distinct hits). The profile is a compile-time-constant
  * `gram → set-membership bitmask` table riding the codegen
  * references array as a prebuilt UTF8String hash map, so each
  * document pays ONE scan of its gram array with an O(1) probe per
  * element — the map-side-literal form of a broadcast equi-join
  * against a bounded build side.
  *
  * Why it exists: the langid scorer joined the corpus-sized exploded
  * gram stream against a ≤ |langs|·profile row frame — a second
  * full Generate over every gram of the corpus plus a broadcast hash
  * probe and a (doc, lang) re-aggregate, all to count occurrences
  * doc-locally. With the profile collected (bounded by contract:
  * |langs| × profile size rows), the whole probe side collapses into
  * this expression and no corpus-sized operator remains downstream
  * of the profile aggregate. Oracle unchanged.
  */
case class CountInGramSets(child: Expression,
                           gramSets: Seq[(String, Seq[Int])],
                           nSets: Int) extends UnaryExpression {

  require(nSets >= 0, s"count_in_gram_sets needs nSets >= 0, got $nSets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_gram_sets expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  @transient private lazy val probe: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]](gramSets.size * 2)
    gramSets.foreach { case (g, idxs) =>
      m.put(UTF8String.fromString(g), idxs.toArray)
    }
    m
  }

  override def nullSafeEval(a: Any): Any =
    CountInGramSets.evalCounts(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      probe, nSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("gramProbe", probe, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInGramSets.evalCounts($c, $p, $nSets);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountInGramSets {

  def evalCounts(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 probe: java.util.HashMap[UTF8String, Array[Int]],
                 nSets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val counts = new Array[Long](nSets)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val idxs = probe.get(arr.getUTF8String(i))
        if (idxs != null) {
          var j = 0
          while (j < idxs.length) { counts(idxs(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** Column-level entry point: `sets` in index order; element k of
    * the result counts occurrences of members of `sets(k)` (a gram in
    * several sets counts toward each). */
  def count_in_gram_sets(c: Column, sets: Seq[Seq[String]]): Column = {
    val byGram = sets.zipWithIndex
      .flatMap { case (s, k) => s.map(g => g -> k) }
      .groupBy(_._1)
      .map { case (g, ks) => g -> ks.map(_._2).sorted }
      .toSeq.sortBy(_._1)
    GraftSqlBridge.toColumn(CountInGramSets(
      GraftSqlBridge.toExpression(c), byGram, sets.size))
  }
}

/** Codegen'd per-document token-duplication fold: the
  * `explode(ts) → count per (doc, term) → per-doc aggregate` pipeline
  * behind the repetition / quality-gate word stats, collapsed to ONE
  * pass over the token array. Output
  * `struct<n_words, n_distinct, wchars, max_c>` — all exact longs
  * (total tokens, distinct tokens, summed code-point lengths of the
  * tokens, the top term's multiplicity), so the fold is bit-identical
  * to the aggregate route by construction. Null elements keep explode
  * parity: they count as one distinct key but contribute no `wchars`
  * (SUM skips null lengths).
  *
  * Why it exists: the histogram is doc-local by definition, and the
  * aggregate route shuffles one row per TOKEN of the corpus into a
  * corpus-sized hash aggregate before anything collapses — twice,
  * for every consumer of the word stats. DuckDB oracles unchanged.
  */
case class TokenDupStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_dup_stats expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = TokenDupStats.structType

  override def nullSafeEval(a: Any): Any =
    TokenDupStats.evalStats(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenDupStats.evalStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenDupStats {

  val structType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("wchars", LongType, nullable = false),
    StructField("max_c", LongType, nullable = false)))

  def evalStats(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]](math.max(8, n))
    var wchars = 0L
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1L
      else {
        val t = arr.getUTF8String(i)
        wchars += t.numChars()
        val c = counts.get(t)
        if (c == null) counts.put(t, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    var maxC = nulls // a null key's multiplicity, like the explode route's
    var distinct = if (nulls > 0L) 1L else 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxC) maxC = c
      distinct += 1L
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct, wchars, maxC))
  }

  /** Column-level entry point. */
  def token_dup_stats(c: Column): Column =
    GraftSqlBridge.toColumn(TokenDupStats(GraftSqlBridge.toExpression(c)))
}

/** Codegen'd per-document shingle-duplication fold: the
  * `explode(shingles(ts, n)) → count per (doc, shingle) → per-doc
  * aggregate` pipeline collapsed to one pass. Output
  * `struct<n_sh, d_sh>` — total n-gram count (`max(0, len − n + 1)`)
  * and DISTINCT n-gram count, exact longs. Shingles are built with
  * the same `UTF8String.concatWs` the [[Shingles]] expression uses,
  * so distinctness is decided over byte-identical strings.
  */
case class ShingleDupStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle_dup_stats needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_dup_stats expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ShingleDupStats.structType

  override def nullSafeEval(a: Any): Any =
    ShingleDupStats.evalStats(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleDupStats.evalStats($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleDupStats {
  private val Space = UTF8String.fromString(" ")

  val structType: StructType = StructType(Seq(
    StructField("n_sh", LongType, nullable = false),
    StructField("d_sh", LongType, nullable = false)))

  def evalStats(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val len = arr.numElements()
    val total = math.max(0, len - n + 1)
    val seen = new java.util.HashSet[UTF8String](math.max(8, total))
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total.toLong, seen.size.toLong))
  }

  /** Column-level entry point. */
  def shingle_dup_stats(c: Column, n: Int): Column =
    GraftSqlBridge.toColumn(
      ShingleDupStats(GraftSqlBridge.toExpression(c), n))
}

/** Codegen'd per-document character-entropy fold: the whole
  * `explode(chars) → count per (doc, char) → per-doc entropy fold`
  * pipeline of `llm_char_entropy`, collapsed to ONE pass over the
  * string. Output is `struct<n_chars, uniq_chars, entropy_raw>` where
  * `entropy_raw = ln(N) − Σ c·ln(c) / N` over the exact per-code-point
  * counts — identical values to the aggregate formulation (the sum
  * has one term per DISTINCT character either way; both routes sum
  * doubles in unspecified order, and the published surface rounds to
  * 4 dp). Empty string ⇒ n_chars = 0 (the operator filters it, parity
  * with explode-of-empty dropping the doc).
  *
  * Why it exists: the aggregate route shuffles one row per CHARACTER
  * of the corpus into a corpus-sized hash aggregate before anything
  * collapses. The histogram is doc-local by definition — a per-row
  * open-addressing fold turns the whole operator into scan →
  * projection → (docs-sized) sort, no exchange over character rows at
  * any scale. DuckDB oracle unchanged.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = CharEntropyStats.structType

  override def nullSafeEval(s: Any): Any =
    CharEntropyStats.evalStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.evalStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {

  val structType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("uniq_chars", LongType, nullable = false),
    StructField("entropy_raw", DoubleType, nullable = false)))

  def evalStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val nb = bytes.length
    // open-addressing code-point histogram (alphabet-sized: a few
    // dozen slots for natural text, grown on demand)
    var cap = 64
    var keys = new Array[Int](cap)
    var cnts = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1)
    var size = 0
    var total = 0L
    var i = 0
    while (i < nb) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      // decode the code point as its raw UTF-8 bytes packed into an
      // int — a bijection over well-formed sequences (w <= 4 bytes,
      // but only the identity as a histogram key matters, not the
      // scalar value)
      var cp = bytes(i) & 0xff
      var j = 1
      while (j < w && i + j < nb) { cp = (cp << 8) | (bytes(i + j) & 0xff); j += 1 }
      i += w
      total += 1
      // probe
      var slot = (cp * 0x9e3779b9) >>> (32 - Integer.numberOfTrailingZeros(cap))
      while (keys(slot) != -1 && keys(slot) != cp) slot = (slot + 1) & (cap - 1)
      if (keys(slot) == -1) {
        keys(slot) = cp
        cnts(slot) = 1L
        size += 1
        if (size * 4 >= cap * 3) { // grow at 75%
          val ncap = cap * 2
          val nkeys = new Array[Int](ncap)
          val ncnts = new Array[Long](ncap)
          java.util.Arrays.fill(nkeys, -1)
          var q = 0
          while (q < cap) {
            val k = keys(q)
            if (k != -1) {
              var ns = (k * 0x9e3779b9) >>> (32 - Integer.numberOfTrailingZeros(ncap))
              while (nkeys(ns) != -1) ns = (ns + 1) & (ncap - 1)
              nkeys(ns) = k
              ncnts(ns) = cnts(q)
            }
            q += 1
          }
          keys = nkeys; cnts = ncnts; cap = ncap
        }
      } else {
        cnts(slot) += 1L
      }
    }
    var sumClnC = 0.0
    var q = 0
    while (q < cap) {
      if (keys(q) != -1) sumClnC += cnts(q).toDouble * java.lang.Math.log(cnts(q).toDouble)
      q += 1
    }
    val raw =
      if (total == 0L) 0.0
      else java.lang.Math.log(total.toDouble) - sumClnC / total.toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, size.toLong, raw))
  }

  /** Column-level entry point. */
  def char_entropy_stats(c: Column): Column =
    GraftSqlBridge.toColumn(CharEntropyStats(GraftSqlBridge.toExpression(c)))
}
