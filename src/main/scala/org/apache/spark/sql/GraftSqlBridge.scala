package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved the classic `new Column(expr)` / `col.expr` surface
  * behind `private[sql]` (`classic.ExpressionUtils`); extension
  * libraries shipping custom Catalyst `Expression`s (our codegen'd
  * `DotProduct`) still need the conversion, and placing one tiny
  * bridge object in the sql package is the established pattern for
  * that — no Spark internals are modified or shadowed.
  */
object GraftSqlBridge {
  private val registrationLock = new Object

  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `private[sql]` float normalization, bridged for the custom
    * top-k operator: -0.0/0.0 and NaN bit patterns must group the way
    * Aggregate/Window group them. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** The bloom-sketch aggregate behind Spark's own runtime filter
    * rewrite (`InjectRuntimeFilter` plants exactly this pair), bridged
    * for EXPLICIT pipeline use: fold a column into one fixed-size
    * bitset sized for `expectedItems` at false-positive rate `fpp`.
    * Partial+final like any sketch aggregate. */
  def bloomFilterAgg(c: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    toColumn(new BloomFilterAggregate(new XxHash64(Seq(toExpression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a serialized bloom bitset — a codegen'd
    * Catalyst expression (`BloomFilterMightContain`), NOT a UDF, so
    * the prefilter runs inside the scan's whole-stage-codegen span. */
  def mightContain(bloom: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    toColumn(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(toExpression(c)))))
  }

  /** Per-key top-k via the custom [[graft.plans.TopKPerKey]] operator
    * (whole-operator extension tier): registers the planner strategy
    * on the session (idempotent) and wraps the frame's analyzed plan.
    * `order` accepts `col.desc` / `col.asc` columns; bare columns
    * default to ascending. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val strategy = graft.plans.TopKPerKeyStrategy
    // registration is a read-modify-write on shared session state —
    // serialize it so concurrent first calls can't double-register or
    // drop a third party's concurrent strategy append
    registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
    }
    // Columns carry LAZY internal nodes (ColumnNodeExpression), not
    // resolved catalyst expressions — route them through throwaway
    // Sort/Project plans so the standard analyzer resolves them
    // against df's plan, then harvest the catalyst expressions
    val sorted = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed.asInstanceOf[Sort]
    val keyExprs = df.select(keys: _*)
      .queryExecution.analyzed.asInstanceOf[Project].projectList
    classic.Dataset.ofRows(spark,
      graft.plans.TopKPerKey(keyExprs, sorted.order, k, sorted.child))
  }
}
