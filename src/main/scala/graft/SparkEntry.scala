package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.ReferenceQueries
import graft.sources.Ingest

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * [[queries]]; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL
  * for the driver's differential check (hash compare at sf0.01).
  * Column names and types are aligned pairwise (bigint counts, string
  * names) because the compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's Title query (`Code/mapReduce.erl:21-30`): movies
    * sharing cast with "order-1", bucketed by overlap size.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.titleLevels(spark, "/root/testdata/sf0.001", "order-1")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2.2-2.5, §3.1-3.2) —
    "ref_title_levels" -> ((s, d) => ReferenceQueries.titleLevels(s, d, "order-1")),
    "ref_title_missing" -> ((s, d) => ReferenceQueries.titleLevels(s, d, "order-no-such")),
    "ref_actor_coactors" -> ((s, d) => ReferenceQueries.actorCoactors(s, d, "7")),
    "ref_level_histogram" -> ((s, d) => ReferenceQueries.levelHistogram(s, d, "order-1")),
    // — sources / sinks / ETL (SURVEY §2.1, §3.3) —
    "src_csv_roundtrip" -> ((s, d) => Ingest.csvRoundTrip(s, d)),
    "src_parquet_roundtrip" -> ((s, d) => Ingest.parquetRoundTrip(s, d)),
    "src_ingest_limit" -> ((s, d) => Ingest.ingestLimit(s, d)),
    "src_repartition" -> ((s, d) => Ingest.repartitionBalance(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ref_title_levels" -> ReferenceQueries.titleLevelsSql("order-1"),
    "ref_title_missing" -> ReferenceQueries.titleLevelsSql("order-no-such"),
    "ref_actor_coactors" -> ReferenceQueries.actorCoactorsSql("7"),
    "ref_level_histogram" -> ReferenceQueries.levelHistogramSql("order-1"),
    "src_csv_roundtrip" -> Ingest.csvRoundTripSql,
    "src_parquet_roundtrip" -> Ingest.parquetRoundTripSql,
    "src_ingest_limit" -> Ingest.ingestLimitSql(),
    "src_repartition" -> Ingest.repartitionBalanceSql,
  )
}
