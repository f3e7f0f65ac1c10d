package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make custom expressions callable
  * from plain SQL in a session built with withExtensions.
  *
  * Care in a shared-JVM test run: the SparkContext is JVM-global, so
  * this spec must NOT stop() its session (that would kill every other
  * suite's session too); it detaches the default session so
  * getOrCreate honors withExtensions, then restores it. */
class ExtensionsSpec extends AnyFunSuite {
  test("dot_product is callable from SQL via GraftExtensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val got = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(got == 11.0)
      // the round-3 kernels are SQL-callable too
      val sh = spark.sql(
        "SELECT shingles(array('a','b','c','d'), 3) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val h = spark.sql("SELECT md5_i32('abc', '7:') AS h").head().getLong(0)
      val ref = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("7:abc".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8), 16)
      assert(h == ref)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
