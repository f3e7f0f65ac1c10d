package graft

import graft.sources.Tables
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Version-robustness smoke: read every harness table through the
  * library's loaders and pin the Catalyst types downstream operators
  * assume. When the next engine or testdata upgrade shifts a reader
  * mapping (the round-7 lesson: parquet timestamp handling changed
  * under Spark 4.1 and 18 queries failed analysis in scattered
  * places), THIS spec names the break in one place.
  *
  * Notes on the pinned types:
  *  - `events.ts` is pinned to TimestampType — that is
  *    [[Tables.events]]'s normalization contract, whatever physical
  *    type the writer used.
  *  - `o_orderdate` / `l_shipdate` are parquet
  *    TIMESTAMP(MICROS, isAdjustedToUTC=false), which this reader
  *    yields as TIMESTAMP_NTZ; operators and oracle SQL both treat
  *    them as zone-less wall-clock values, so NTZ is the correct pin
  *    (not a bug to normalize away).
  */
class TablesSchemaSpec extends AnyFunSuite with SparkSpec {

  test("every harness table reads with the expected Catalyst types") {
    val checks: Seq[(String, Map[String, DataType])] = Seq(
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType),
      "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    )
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    val failures = checks.flatMap { case (tbl, want) =>
      val got = loaders(tbl)(spark, sf).schema.fields
        .map(f => f.name -> f.dataType).toMap
      want.flatMap { case (col, dt) =>
        got.get(col) match {
          // compare the SQL rendering — ignores nullability flags
          case Some(actual) if actual.sql == dt.sql => None
          case Some(actual) => Some(s"$tbl.$col: expected $dt, read $actual")
          case None => Some(s"$tbl.$col: column missing (have ${got.keys.toSeq.sorted.mkString(", ")})")
        }
      }
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }
}
