package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar helpers: tokenization, shingling, language
  * markers. These extend the engine beyond the reference (which only
  * ever splits a cast string on "," — `Code/mapReduce.erl:140-143`)
  * toward the operations a large-scale training-data pipeline needs:
  * dedup shingles, language ID, quality scoring, token accounting.
  *
  * Every helper is a composition of codegen'd built-ins and has an
  * exact DuckDB mirror (the `*Sql` fragments) so downstream queries
  * stay differentially checkable. Regex semantics: only ASCII classes
  * (`\w`, `\S`) are used, where Java regex (Spark) and RE2 (DuckDB)
  * agree.
  */
object TextAnalysis {

  /** Lower-cased word tokens, in document order (duplicates kept).
    * Unicode letter/digit classes, NOT `\w`: Java's ASCII-only `\w`
    * never matches CJK text, which would make the zh language-ID
    * branch structurally unreachable. `\p{L}`/`\p{N}` agree between
    * Java regex (Spark) and RE2 (DuckDB). Backed by the codegen'd
    * [[graft.functions.WordTokens]] walk — the regex formulation
    * ([[tokensRegex]]) paid the Java regex engine per character on
    * ~70 call sites; equivalence is spec-pinned. */
  def tokens(c: Column): Column =
    graft.functions.WordTokens.word_tokens(c)

  /** The regex formulation [[tokens]] replaced, kept as the
    * equivalence-spec reference (the [[shinglesHof]] convention) —
    * and what the DuckDB [[tokensSql]] mirror still runs. */
  private[graft] def tokensRegex(c: Column): Column =
    regexp_extract_all(lower(c), lit("[\\p{L}\\p{N}_]+"), lit(0))

  val tokensSql = "regexp_extract_all(lower(text), '[\\p{L}\\p{N}_]+')"

  /** Word n-gram shingles over an in-order token array, duplicates
    * KEPT (fingerprint sums weight repeated shingles). Token count
    * < n ⇒ empty array. Backed by the codegen'd
    * [[graft.functions.Shingles]] expression — the higher-order
    * formulation ([[shinglesHof]]) is CodegenFallback and paid
    * interpreted lambda dispatch per shingle on the hottest loop in
    * the library; equivalence is spec-pinned. */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.Shingles.shingles_expr(toks, n)

  /** The built-in higher-order formulation, kept as the reference
    * implementation for the equivalence spec. The `when` guard
    * matters: Spark's `sequence` happily generates a descending range
    * for start > stop. */
  private[graft] def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** DuckDB mirror for n=3 over a token-list column `ts` (1-based;
    * `range(a,b)` is half-open so i runs 1 .. len-2). */
  def shingles3Sql(ts: String): String =
    s"[$ts[i] || ' ' || $ts[i+1] || ' ' || $ts[i+2] for i in range(1, len($ts) - 1)]"

  /** DuckDB mirror for arbitrary n: list slices are inclusive on both
    * ends (`ts[i : i+n-1]` is n elements) joined by `string_agg`;
    * fewer than n tokens ⇒ empty range ⇒ empty list, matching the
    * expression. */
  def shinglesNSql(ts: String, n: Int): String =
    s"[list_aggregate($ts[i:i+${n - 1}], 'string_agg', ' ') " +
      s"for i in range(1, len($ts) - ${n - 2})]"

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic. Short by design: at 100 TB the scoring is
    * a per-row `array_intersect` against a literal array — no join,
    * no shuffle, fully codegen'd. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "les", "des", "est", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "我",
      "有", "和", "就", "不", "人"),
  )

  /** Marker-hit count of one language over a DISTINCT token array. */
  def langScore(distinctToks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(array_intersect(distinctToks, array(markers.map(lit): _*)))
  }

  def langScoreSql(distinctToks: String, lang: String): String = {
    val lits = langMarkers.toMap.apply(lang).map(m => s"'$m'").mkString(", ")
    s"len(list_intersect($distinctToks, [$lits]))"
  }
}
