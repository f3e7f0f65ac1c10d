package graft

import graft.functions.Hashing._
import graft.functions.TextAnalysis._
import graft.operators.TextAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import java.security.MessageDigest

  private def refMd5i32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("md5i32 matches an independent JVM MD5 computation") {
    import spark.implicits._
    val got = Seq("abc", "spark graft", "").toDF("s")
      .select(md5i32($"s", 7).as("h")).as[Long].collect()
    val want = Seq("abc", "spark graft", "").map(s => refMd5i32(s"7:$s"))
    assert(got.toSeq == want)
  }

  test("shingles: 3-grams in order, duplicates kept, short docs empty") {
    import spark.implicits._
    val got = Seq("a b c d a b c", "a b", "").toDF("text")
      .select(shingles(tokens($"text"), 3).as("sh")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d a", "d a b", "a b c"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("langScore counts distinct marker hits") {
    import spark.implicits._
    val dt = array_distinct(tokens($"text"))
    val row = Seq("The cat and the dog of a house").toDF("text")
      .select(langScore(dt, "en").as("en"), langScore(dt, "de").as("de"))
      .head()
    assert(row.getInt(0) == 4) // the, and, of, a
    assert(row.getInt(1) == 0)
  }

  test("fingerprint n_shingles == word_tokens - 2 (cross-query consistency)") {
    import spark.implicits._
    val fp = TextAnalytics.fingerprint(spark, sf).select($"doc_id", $"n_shingles")
    val tc = TextAnalytics.tokenCount(spark, sf).select($"doc_id", $"word_tokens")
    val bad = fp.join(tc, "doc_id")
      .filter($"n_shingles" =!= $"word_tokens" - 2)
      .count()
    assert(bad == 0)
  }

  test("HLL approximate distinct is within 5% of exact") {
    import spark.implicits._
    // the shipped query is sketch-only (exact distinct is the
    // scale-killer it replaces) — the error bound is pinned HERE
    // against the test-only exact twin
    val bad = TextAnalytics.approxDistinct(spark, sf)
      .join(TextAnalytics.exactDistinctShingles(spark, sf), "lang")
      .filter(abs($"approx_shingles" - $"exact_shingles")
        > $"exact_shingles" * 0.05)
      .count()
    assert(bad == 0)
  }

  test("token counts are consistent: subword >= word >= ws tokens") {
    import spark.implicits._
    val bad = TextAnalytics.tokenCount(spark, sf)
      .filter(!($"subword_tokens" >= $"word_tokens" && $"word_tokens" >= $"ws_tokens"))
      .count()
    assert(bad == 0)
  }
}
