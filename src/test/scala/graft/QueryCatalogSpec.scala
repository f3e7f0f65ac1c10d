package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide guard: every registered query must build AND execute
  * against sf0.001, and the oracle map may only reference registered
  * queries — a broken registration or a query that throws at plan or
  * run time fails HERE before it zeroes a driver round. */
class QueryCatalogSpec extends AnyFunSuite with SparkSpec {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every catalog query executes at sf0.001 with a non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          assert(df.schema.fields.nonEmpty, s"$name: empty schema")
          df.write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
