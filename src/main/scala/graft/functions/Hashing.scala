package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral deterministic hashing for dedup / LSH operators.
  *
  * The driver differentially checks every query against DuckDB, so any
  * hash that feeds a checked result must produce IDENTICAL values in
  * both engines. Spark's `hash`/`xxhash64` and DuckDB's `hash` are
  * different algorithms; `md5` is the one digest both implement
  * bit-identically. We take the first 8 hex chars (32 bits) parsed as
  * an unsigned int — small enough that sums of millions of them stay
  * inside a BIGINT, large enough for MinHash/LSH discrimination.
  *
  * The hot single-salt paths ride the custom codegen'd [[Md5Int32]]
  * expression (digest → long directly, thread-local digest instance);
  * the column-salt variant and the affine family stay codegen'd
  * built-ins. No UDFs anywhere.
  */
object Hashing {

  /** 32-bit salted hash of a string column: distinct salts give
    * independent hash functions (the MinHash "permutation" family).
    * Backed by the codegen'd [[Md5Int32]] expression — identical
    * values to the hex-substring composition (spec-pinned), minus the
    * per-row hex materialization + reparse. */
  def md5i32(c: Column, salt: Int): Column =
    Md5Int32.md5_i32(c, s"$salt:")

  /** Same, with the salt itself a column (per-row hash family index —
    * used when the family is joined in as data, e.g. LSH planes). */
  def md5i32(c: Column, salt: Column): Column =
    conv(substring(md5(concat(salt.cast("string"), lit(":"), c)), 1, 8), 16, 10).cast("long")

  /** DuckDB mirror of [[md5i32]] for oracle SQL: `salt` and `expr`
    * are SQL fragments. */
  def md5i32Sql(expr: String, salt: String): String =
    s"('0x' || substr(md5($salt || ':' || $expr), 1, 8))::BIGINT"

  def md5i32Sql(expr: String, salt: Int): String = md5i32Sql(expr, s"'$salt'")

  /** Affine MinHash family from ONE digest: `h_i = (a + i·b) mod 2^32`
    * with `a`,`b` the first/second 32 bits of md5 (`b` forced odd).
    * One md5 per value instead of one per hash function — the i-th
    * hash is two arithmetic ops, which matters when the family is
    * 16-wide over billions of shingles. */
  def md5PairA(c: Column): Column =
    Md5Int32.md5_i32(c, "")

  def md5PairB(c: Column): Column =
    Md5Int32.md5_i32(c, "", offset = 4).bitwiseOR(lit(1L))

  /** Both words from ONE digest (codegen'd [[graft.functions.Md5Pair]]
    * struct) — use when a row needs A and B together; the separate
    * [[md5PairA]]/[[md5PairB]] calls each digest the value again
    * (subexpression elimination cannot merge inside the expression).
    * Consume as `.withColumn("p", md5Pair($"sh"))` then `$"p.a"` and
    * `$"p.b".bitwiseOR(lit(1L))` (B is forced odd by CONVENTION at
    * the call site, matching [[md5PairB]]). */
  def md5Pair(c: Column): Column = Md5Pair.md5_pair(c)

  def affine32(a: Column, b: Column, i: Int): Column =
    (a + lit(i.toLong) * b).bitwiseAND(lit(4294967295L))

  val md5PairASql: String = "('0x' || substr(md5(sh), 1, 8))::BIGINT"
  val md5PairBSql: String = "(('0x' || substr(md5(sh), 9, 8))::BIGINT | 1)"
  def affine32Sql(a: String, b: String, i: Int): String =
    s"(($a + $i * $b) & 4294967295)"
}
