package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/array helpers matching the reference's parsing
  * semantics (SURVEY.md §2.6). All are compositions of built-in
  * codegen'd functions — no UDFs (a Scala closure would break
  * whole-stage codegen and serialize per-row).
  */
object TextFunctions {

  /** Unicode-aware trim — parity with the reference's
    * `re:replace(..., "^[[:space:]]+|[[:space:]]+$", ...)`
    * (`Code/mapReduce.erl:146-148`, `Code/csv_to_ets.erl:77-81`).
    * Spark's `trim()` only strips ASCII space; Java's
    * `\p{IsWhite_Space}` matches the Unicode property like Erlang's
    * `[[:space:]]` under `unicode`.
    */
  def trimU(c: Column): Column =
    regexp_replace(c, "^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$", "")

  /** Tokenize a comma-separated cast string into a trimmed array —
    * the reference's `tokenize_actors` (`Code/mapReduce.erl:140-143`),
    * run ONCE at ingest instead of per-query (§4.2 inefficiency).
    *
    * Intentional deviation: the reference uses
    * `string:split(..., ",", all)` which KEEPS empty fragments, so on
    * casts with trailing commas / ",," it can count "" as a common
    * actor. We drop empty fragments — a documented improvement, not
    * parity (an empty-string actor is always a data bug).
    */
  def tokenizeActors(c: Column): Column =
    filter(transform(split(c, ","), trimU _), x => length(x) > 0)

  /** Strip one pair of surrounding double quotes
    * (`Code/csv_to_ets.erl:52`); the CSV reader normally does this,
    * kept for parsing raw text lines. */
  def stripQuotes(c: Column): Column =
    regexp_replace(c, "^\"|\"$", "")
}
