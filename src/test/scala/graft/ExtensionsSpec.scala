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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
