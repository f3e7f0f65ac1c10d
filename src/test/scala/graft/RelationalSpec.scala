package graft

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals the plain join and actually shuffles") {
    import spark.implicits._
    val salted = Relational.saltedJoin(spark, sf)
    // the hint must hold: a broadcast would bypass the salted shuffle
    // and make the demo vacuous
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffled hash join in:\n$plan")
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy($"c_mktsegment")
    assert(salted.collect().toSeq == plain.collect().toSeq)
    assert(salted.count() > 0)
  }
}
