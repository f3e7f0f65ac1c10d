package graft.sources

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ETL pipeline (SURVEY.md §3.3) rebuilt Spark-first:
  * one quote-aware CSV parse (the reference runs TWO different
  * parsers over the same file — naive `Code/csv_to_ets.erl:27-60` for
  * the master, RFC-ish `Code/dataAnalyze.erl:42-114` for workers —
  * we follow the correct S2 behavior), tokenize-at-ingest, parquet
  * as the snapshot format replacing `ets:tab2file`.
  *
  * 100 TB posture: CSV → parquet is the one full-data pass; movies
  * land partitioned by id hash so every later keyed op co-locates.
  * No driver materialization anywhere.
  */
object Ingest {

  /** Parse the reference's native CSV shape
    * `MovieID,Title,Actor1,…,ActorN` (variable arity, header row,
    * quoted fields may contain commas / `""` escapes —
    * `Code/dataAnalyze.erl:72-95`). Spark's univocity parser handles
    * quoting; variable arity becomes trailing nulls which we drop.
    * Returns `(id, title, actors: array<string>)`.
    */
  def readMoviesCsv(spark: SparkSession, path: String, hasHeader: Boolean = true): DataFrame =
    parseMovies(rawMoviesCsv(spark, path, hasHeader))

  /** S3 in its ORIGINAL file-order semantics: parse only the first `n`
    * CSV data lines of the file, in file order — the reference's
    * 85,000-line ingest cap (`Code/csv_to_ets.erl:21,33-39`). Valid
    * for a single input file, where Spark orders a split file's scan
    * partitions by byte offset so `limit(n)` takes the leading lines
    * exactly; for multi-file distributed reads "file order" is
    * undefined and [[ingestLimit]]'s key-order analogue applies. The
    * cap is applied BEFORE the blank-line filter, matching the
    * reference (it counts raw lines read, then drops bad ones). */
  def readMoviesCsvCapped(spark: SparkSession, path: String, n: Int,
                          hasHeader: Boolean = true): DataFrame =
    parseMovies(rawMoviesCsv(spark, path, hasHeader).limit(n))

  private def rawMoviesCsv(spark: SparkSession, path: String, hasHeader: Boolean): DataFrame =
    spark.read
      .option("header", hasHeader.toString)
      .option("quote", "\"")
      .option("escape", "\"") // RFC "" escaping, dataAnalyze.erl:84-87
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** [[readMoviesCsv]] with the dead-letter contract the nation
    * fixture pioneered ([[csvQuarantine]]), wired into the library's
    * FRONT DOOR (round-11 verdict item 5): rows the S4 blank-line
    * filter would silently discard — a missing movie id or title, an
    * all-comma line — come back in a second frame carrying the
    * reconstructed raw content, instead of vanishing between the scan
    * and the movies view. (A TRULY blank line is dropped by Spark's
    * CSV reader before parsing and lands in neither frame — the
    * quarantine catches every row that produced a RECORD with a null
    * id/title, which is the reference's S4 semantics.)
    *
    * Returns `(good, quarantined)`: `good` is bit-for-bit
    * [[readMoviesCsv]]'s output (the `ref_*` oracles are unchanged —
    * both run the same single PERMISSIVE scan definition and split it
    * with complementary predicates); `quarantined` is
    * `(_quarantined: string)`, one row per rejected line, ready for a
    * dead-letter sink. The predicate routes each row to exactly one
    * side and the review side is anomaly-sized; note the two frames
    * are two JOBS — a consumer that materializes both should cache
    * the raw scan (or write both sinks from one pass) to avoid
    * re-reading the file. */
  def readMoviesCsvQuarantined(spark: SparkSession, path: String,
                               hasHeader: Boolean = true): (DataFrame, DataFrame) = {
    val raw = rawMoviesCsv(spark, path, hasHeader)
    val cols = raw.columns
    // EXACT complement of parseMovies' S4 filter (empty CSV fields
    // parse as null under the default nullValue), so good ∪ bad is a
    // partition of the scan — no row in both sides, none in neither
    val rejected = col(cols(0)).isNull || col(cols(1)).isNull
    val bad = raw.filter(rejected)
      .select(concat_ws(",",
        cols.toSeq.map(c => coalesce(col(c), lit(""))): _*).as("_quarantined"))
    (parseMovies(raw), bad)
  }

  private def parseMovies(raw: DataFrame): DataFrame = {
    val cols = raw.columns
    val actorCols = array(cols.drop(2).toSeq.map(c => col(c)): _*)
    raw
      .filter(col(cols(0)).isNotNull && col(cols(1)).isNotNull) // S4 blank-line filter
      .select(
        trimU(col(cols(0))).as("id"),
        trimU(col(cols(1))).as("title"),
        filter(transform(actorCols, trimU _), a => a.isNotNull && length(a) > 0)
          .as("actors")) // F1/F2 tokenize+trim once at ingest, not per query (§4.2)
  }

  /** One comma-joined cast string per movie — the `#movie_data.actors`
    * wire shape (`Code/mapReduce.erl:14`; comma-separated string,
    * tokenized by `tokenize_actors`). */
  def moviesAsCsvShape(movies: DataFrame): DataFrame = {
    val spark = movies.sparkSession
    import spark.implicits._
    movies.select($"id", $"title", array_join($"actors", ",").as("actors_str"))
  }

  /** S1/S2/F1-F3 end-to-end: movies view → CSV on disk (writer quotes
    * fields containing commas) → re-read → tokenize → per-movie cast
    * size. Oracle recomputes the same from lineitem directly, so the
    * whole write/parse/tokenize loop must be lossless.
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "csv")
    moviesAsCsvShape(Tables.movies(spark, sfDir))
      .write.mode("overwrite").option("header", "true").csv(tmp)
    spark.read.option("header", "true").option("quote", "\"").option("escape", "\"").csv(tmp)
      .select($"title", tokenizeActors($"actors_str").as("actors"))
      .select($"title", size($"actors").cast("bigint").as("n_actors"))
      .orderBy($"title")
  }

  val csvRoundTripSql: String =
    """SELECT 'order-' || l_orderkey AS title,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_actors
      |FROM lineitem GROUP BY l_orderkey ORDER BY title""".stripMargin

  /** S5: parquet snapshot round-trip replacing `ets:tab2file` /
    * `file2tab` (`Code/csv_to_ets.erl:63-74`, `Code/server.erl:121`).
    * Unlike the reference (reload per query, §4.2) the snapshot is
    * written once; the aggregate proves losslessness.
    */
  def parquetRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "parquet")
    Tables.movies(spark, sfDir).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .select($"id", size($"actors").as("n"))
      .agg(
        count(lit(1)).as("n_movies"),
        sum($"n").cast("bigint").as("total_cast"),
        min($"id").cast("bigint").as("min_id"),
        max($"id").cast("bigint").as("max_id"))
  }

  val parquetRoundTripSql: String =
    """WITH m AS (SELECT l_orderkey AS id, COUNT(DISTINCT l_partkey) AS n
      |           FROM lineitem GROUP BY l_orderkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_movies,
      |       CAST(SUM(n) AS BIGINT) AS total_cast,
      |       CAST(MIN(id) AS BIGINT) AS min_id,
      |       CAST(MAX(id) AS BIGINT) AS max_id
      |FROM m""".stripMargin

  /** Snapshot round-trip through JSON-lines — same losslessness
    * contract as the parquet snapshot (S5) over the row-oriented
    * text format a pipeline exchanges with external tools. */
  def jsonRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "json")
    val m = Tables.movies(spark, sfDir)
    m.write.mode("overwrite").json(tmp)
    // read with the writer's schema: schemaless JSON read costs a
    // full inference pass over the data — the one JSON-source cost
    // that does NOT amortize at 100 TB (snapshots store their schema)
    spark.read.schema(m.schema).json(tmp)
      .select($"id", size($"actors").as("n"))
      .agg(
        count(lit(1)).as("n_movies"),
        sum($"n").cast("bigint").as("total_cast"),
        min($"id").cast("bigint").as("min_id"),
        max($"id").cast("bigint").as("max_id"))
  }

  val jsonRoundTripSql: String = parquetRoundTripSql

  /** Snapshot round-trip through ORC — the second columnar snapshot
    * format Spark ships natively; same aggregate contract. */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "orc")
    Tables.movies(spark, sfDir).write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .select($"id", size($"actors").as("n"))
      .agg(
        count(lit(1)).as("n_movies"),
        sum($"n").cast("bigint").as("total_cast"),
        min($"id").cast("bigint").as("min_id"),
        max($"id").cast("bigint").as("max_id"))
  }

  val orcRoundTripSql: String = parquetRoundTripSql

  /** S3/O3: the reference's first-85,000-rows ingest cap
    * (`Code/csv_to_ets.erl:21`). File order is not defined across a
    * distributed read, so the deterministic analogue is key order:
    * first N orders by key.
    */
  def ingestLimit(spark: SparkSession, sfDir: String, n: Int = 100): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .orderBy($"o_orderkey")
      .limit(n)
      .agg(
        count(lit(1)).as("n_rows"),
        max($"o_orderkey").cast("bigint").as("max_key"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
  }

  def ingestLimitSql(n: Int = 100): String =
    s"""WITH first_n AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT $n)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM first_n""".stripMargin

  /** S3 end-to-end in FILE order: stage the movies view as ONE
    * title-sorted CSV file (deterministic file order the oracle can
    * replay), then ingest through [[readMoviesCsvCapped]] — the cap
    * applied to leading file lines exactly as `csv_to_ets.erl:21`
    * does, not to sorted keys. */
  def ingestLimitFileOrder(spark: SparkSession, sfDir: String, n: Int = 100): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "caplimit")
    moviesAsCsvShape(Tables.movies(spark, sfDir))
      .orderBy($"title")
      .coalesce(1) // single part-file: file order == title order
      .write.mode("overwrite").option("header", "true").csv(tmp)
    readMoviesCsvCapped(spark, tmp, n)
      .select($"title", tokenizeActors(col("actors")(0)).as("cast"))
      .agg(
        count(lit(1)).as("n_rows"),
        min($"title").as("first_title"),
        max($"title").as("last_title"),
        sum(size($"cast")).cast("bigint").as("total_cast"))
  }

  def ingestLimitFileOrderSql(n: Int = 100): String =
    s"""WITH m AS (
       |  SELECT 'order-' || l_orderkey AS title, COUNT(DISTINCT l_partkey) AS n
       |  FROM lineitem GROUP BY l_orderkey
       |), first_n AS (SELECT * FROM m ORDER BY title LIMIT $n)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       MIN(title) AS first_title,
       |       MAX(title) AS last_title,
       |       CAST(SUM(n) AS BIGINT) AS total_cast
       |FROM first_n""".stripMargin

  /** X1/O2: the reference shuffles rows randomly and deals equal
    * contiguous chunks to workers (`Code/dataToServers.erl:20-53`) —
    * load balance only. Spark: round-robin `repartition(n)`. The
    * check is multiset preservation across the exchange.
    */
  def repartitionBalance(spark: SparkSession, sfDir: String, n: Int = 8): DataFrame = {
    import spark.implicits._
    Tables.movies(spark, sfDir)
      .repartition(n)
      .agg(count(lit(1)).as("n_movies"),
           count_distinct($"id").as("n_ids"))
  }

  val repartitionBalanceSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_movies,
      |       CAST(COUNT(*) AS BIGINT) AS n_ids
      |FROM (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey)""".stripMargin

  /** Distinct scratch dir per (run, sf, kind) — the shared
    * [[RunToken]] keeps concurrent runs on the SAME sfDir disjoint
    * while repeated calls in one run reuse (overwrite) the same dir. */
  /** Date-partitioned snapshot + pruned read: orders written
    * `partitionBy(month)` — the time-series layout at 100 TB — then
    * read back with a single-month predicate. The month filter is a
    * PARTITION filter: the scan prunes to one directory before any
    * file IO (pinned by `PartitionPruneSpec`), where an unpartitioned
    * snapshot would scan every file. The aggregate proves the
    * partitioned layout is lossless; the oracle applies the same
    * month predicate to the raw table. */
  def partitionedSnapshot(spark: SparkSession, sfDir: String,
                          month: String = "1996-06"): DataFrame = {
    import spark.implicits._
    partitionedOrders(spark, sfDir)
      .filter($"o_month" === month)
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_price"),
        count_distinct($"o_custkey").cast("long").as("n_customers"))
  }

  /** The month-partitioned snapshot read frame (write-once per run).
    *
    * Layout: `repartition($"o_month")` BEFORE `partitionBy` so each
    * month's rows sit in exactly one task → exactly one file per
    * month directory. Without it every shuffle partition writes into
    * every month dir (up to cpus×months tiny files) — the classic
    * small-files explosion a 100 TB time-series layout must avoid,
    * and every later read pays partition discovery over that forest.
    * (At a scale where one month exceeds a healthy file size, add an
    * intra-month salt column to the repartition — same shape, N
    * bounded files per month instead of 1.)
    *
    * The check-then-write is serialized per target dir (double-checked
    * under a monitor): two concurrent callers in one JVM would
    * otherwise both see `_SUCCESS` missing and race overlapping
    * overwrites of the same directory. */
  private[graft] def partitionedOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "bymonth")
    if (!new java.io.File(tmp, "_SUCCESS").exists()) {
      bymonthLocks.computeIfAbsent(tmp, _ => new Object).synchronized {
        if (!new java.io.File(tmp, "_SUCCESS").exists()) {
          Tables.orders(spark, sfDir)
            .withColumn("o_month", date_format($"o_orderdate", "yyyy-MM"))
            .repartition($"o_month")
            .write.mode("overwrite").partitionBy("o_month").parquet(tmp)
        }
      }
    }
    spark.read.parquet(tmp)
  }

  private val bymonthLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // ---------------------------------------------------------------
  // src_zorder_snapshot — Z-order (Morton curve) data layout
  // ---------------------------------------------------------------

  /** Morton Z-value interleaving the low `bits` bits of two key
    * columns: bit j of `a` lands at position 2j, bit j of `b` at
    * 2j+1. A pure bit-arithmetic Column (codegen'd, no UDF); rows
    * close in (a, b) space get close Z-values, so range-partitioning
    * + sorting by Z clusters BOTH dimensions into every file. */
  private[graft] def zvalue(a: org.apache.spark.sql.Column,
                            b: org.apache.spark.sql.Column,
                            bits: Int = 20): org.apache.spark.sql.Column = {
    // 20 bits/dim (keys to ~1M; z fits 40 bits in a long). Keys above
    // 2^bits alias silently — size bits to the key domain, not the
    // current SF: extra bits cost nothing for small keys (high
    // interleaved bits are zero, ordering unchanged).
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { j =>
      shiftleft(shiftright(al, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(bl, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** The Z-ordered lineitem frame (write-once per run, same
    * double-checked pattern as [[partitionedOrders]]): range-
    * partitioned AND sorted by z(l_partkey, l_suppkey) so every
    * parquet file covers a small rectangle of the (part, supp) plane
    * — its footer min/max on BOTH columns are tight, and a 2-D box
    * predicate prunes most files/row-groups at the scan. This is the
    * multi-dimensional analogue of [[partitionedOrders]]'s 1-D time
    * layout: the standard answer when scans filter on two independent
    * columns and partitioning by either alone leaves the other
    * unpruned (Delta/Iceberg OPTIMIZE ZORDER — here in plain Spark +
    * parquet). */
  private[graft] def zorderedLineitem(spark: SparkSession, sfDir: String,
                                      files: Int = 16): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "zorder")
    if (!new java.io.File(tmp, "_SUCCESS").exists()) {
      bymonthLocks.computeIfAbsent(tmp, _ => new Object).synchronized {
        if (!new java.io.File(tmp, "_SUCCESS").exists()) {
          Tables.lineitem(spark, sfDir)
            .withColumn("z", zvalue($"l_partkey", $"l_suppkey"))
            .repartitionByRange(files, $"z")
            .sortWithinPartitions($"z")
            .drop("z")
            .write.mode("overwrite").parquet(tmp)
        }
      }
    }
    spark.read.parquet(tmp)
  }

  /** Box query over the Z-ordered layout: a 2-D predicate on
    * (l_partkey, l_suppkey) that the scan answers from a handful of
    * files. The result is layout-independent (the oracle reads the
    * raw table), so correctness certifies the rewrite while the scan
    * shape carries the 100 TB story; ZorderLayoutSpec pins the
    * locality (per-file bounding boxes ≪ the global plane). */
  def zorderSnapshot(spark: SparkSession, sfDir: String,
                     pLo: Int = 100, pHi: Int = 140,
                     sLo: Int = 2, sHi: Int = 6): DataFrame = {
    import spark.implicits._
    zorderedLineitem(spark, sfDir)
      .filter($"l_partkey".between(pLo, pHi) && $"l_suppkey".between(sLo, sHi))
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total_qty"),
        count_distinct($"l_partkey").cast("long").as("n_parts"),
        count_distinct($"l_orderkey").cast("long").as("n_orders"))
  }

  def zorderSnapshotSql(pLo: Int = 100, pHi: Int = 140,
                        sLo: Int = 2, sHi: Int = 6): String =
    s"""SELECT COUNT(*) AS n_rows,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
       |FROM lineitem
       |WHERE l_partkey BETWEEN $pLo AND $pHi
       |  AND l_suppkey BETWEEN $sLo AND $sHi""".stripMargin

  /** Dynamic partition pruning over the month-partitioned snapshot —
    * the RUNTIME complement of the static prune `src_partitioned
    * _snapshot` demonstrates: here the month set comes from a JOIN
    * against a filtered dimension (the months containing an urgent
    * order from the 1-in-199 customer cohort), so no literal
    * predicate exists at plan time. Catalyst's DPP rewrite plants the
    * broadcast result of the dim side as a `dynamicpruningexpression`
    * in the scan's PartitionFilters, and the fact scan reads ONLY the
    * surviving month directories (spec-pinned: pruning expression
    * present + selected partitions < total). At 100 TB this is THE
    * mechanism that makes fact-to-dim joins over a date-partitioned
    * lake affordable — the fact side never enumerates history. The
    * oracle applies the same dim semantics to the raw table. */
  def dppSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_custkey" % 199 === 0)
      .select(date_format($"o_orderdate", "yyyy-MM").as("m"))
      .distinct()
    partitionedOrders(spark, sfDir)
      .join(dim, $"o_month" === $"m")
      .groupBy($"o_month")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy($"o_month")
  }

  val dppSnapshotSql: String =
    """WITH m AS (
      |  SELECT DISTINCT strftime(o_orderdate::TIMESTAMP, '%Y-%m') AS m
      |  FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_custkey % 199 = 0)
      |SELECT strftime(o_orderdate::TIMESTAMP, '%Y-%m') AS o_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN m ON strftime(o_orderdate::TIMESTAMP, '%Y-%m') = m.m
      |GROUP BY 1 ORDER BY o_month""".stripMargin

  def partitionedSnapshotSql(month: String = "1996-06"): String =
    s"""SELECT COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
       |FROM orders
       |WHERE strftime(o_orderdate::TIMESTAMP, '%Y-%m') = '$month'""".stripMargin

  /** Number of malformed lines [[csvQuarantine]] plants — referenced
    * by both the operator and its oracle SQL. */
  val QuarantineBadLines = 3

  /** Malformed-row quarantine (ingest robustness): nation goes out as
    * a schemaless CSV, [[QuarantineBadLines]] corrupt lines (text in
    * the integer key column) are planted beside it, and the read-back
    * uses an EXPLICIT schema in PERMISSIVE mode with
    * `columnNameOfCorruptRecord` — type-mismatched rows come back
    * with the raw line captured in the quarantine column instead of
    * killing the job or silently vanishing. The report is the
    * good/quarantined accounting plus a good-row checksum proving the
    * corrupt rows contaminated nothing.
    *
    * At 100 TB this is THE ingest posture: schema-on-read with a
    * quarantine column routes bad source lines to a dead-letter
    * review instead of failing a 10-hour job at hour nine
    * (FAILFAST) or dropping rows unaccounted (DROPMALFORMED).
    */
  def csvQuarantine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = roundTripDir(sfDir, "quarantine")
    Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .write.mode("overwrite").csv(tmp)
    // plant the corrupt lines as one more part file — the fixture
    // analogue of a producer shipping malformed records
    val bad = (1 to QuarantineBadLines)
      .map(i => s"not_an_int_$i,BADROW$i,xyz").mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "part-bad.csv"),
      bad.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the corrupt file lands BEHIND Spark's back (that's the point of
    // the fixture) — drop the session's cached listing/data for the
    // path or a rerun reads the pre-plant file set
    spark.catalog.refreshByPath(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_regionkey",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_quarantined",
        org.apache.spark.sql.types.StringType)))
    val read = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_quarantined")
      .csv(tmp)
      // Spark refuses to filter on ONLY the corrupt-record column of a
      // lazy CSV scan (the row would need re-parsing); materialize the
      // parsed frame first — at scale this is the pass that writes the
      // clean snapshot anyway
      .cache()
    // the aggregate is a 3-long scalar: run it eagerly so the cached
    // PERMISSIVE scan can be unpersisted immediately instead of
    // pinning the session's CacheManager for its lifetime
    val row = read.agg(
      sum(when($"_quarantined".isNull, 1L).otherwise(0L)).as("n_good"),
      sum(when($"_quarantined".isNotNull, 1L).otherwise(0L)).as("n_bad"),
      sum(when($"_quarantined".isNull, $"n_nationkey".cast("long"))
        .otherwise(0L)).as("good_key_sum")).head()
    read.unpersist()
    // an empty quarantine read (fixture write failed / path cleaned)
    // makes every SUM null — surface that as zeros, not an NPE from
    // getLong on a null cell (advisor r9)
    def longAt(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    Seq((longAt(0), longAt(1), longAt(2)))
      .toDF("n_good", "n_bad", "good_key_sum")
  }

  val csvQuarantineSql: String =
    s"""SELECT (SELECT COUNT(*) FROM nation) AS n_good,
       |  CAST($QuarantineBadLines AS BIGINT) AS n_bad,
       |  (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation) AS good_key_sum""".stripMargin

  private def roundTripDir(sfDir: String, kind: String): String = {
    val tmp = System.getProperty("java.io.tmpdir", "/tmp")
    s"$tmp/graft_roundtrip_${RunToken.value}_${kind}_${sfDir.hashCode.toHexString}"
  }

  // ---------------------------------------------------------------
  // src_schema_evolution — additive schema evolution without rewrite
  // ---------------------------------------------------------------

  /** Additive schema evolution served by `mergeSchema`: generation-1
    * parquet files carry `(v, o_orderkey, o_totalprice)`, generation-2
    * files add `o_orderpriority`, and ONE read over both generations
    * unions the schemas — old files serve NULL for the new column.
    * This is how a 100 TB table evolves in practice: new columns
    * appear in new files only, no backfill rewrite of the existing
    * corpus; the cost is a footer-schema union at planning time
    * (which is why production tables pin the merged schema in a
    * catalog rather than re-deriving it per read — `mergeSchema` here
    * stands in for that catalog lookup). The census reports, per
    * generation, the row count, how many rows actually HAVE the
    * evolved column, and the decimal-exact price total — pinning
    * that NULL-filling never drops or fabricates rows. */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    evolvedOrders(spark, sfDir)
      .groupBy($"v")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"o_orderpriority".isNotNull, 1L).otherwise(0L))
          .as("n_with_priority"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy($"v")
  }

  /** The two-generation snapshot read frame (write-once per run,
    * same serialized check-then-write as [[partitionedOrders]]). */
  private[graft] def evolvedOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val root = roundTripDir(sfDir, "evolve")
    val done = new java.io.File(root, "_DONE")
    if (!done.exists()) {
      bymonthLocks.computeIfAbsent(root, _ => new Object).synchronized {
        if (!done.exists()) {
          val o = Tables.orders(spark, sfDir)
          o.filter($"o_orderkey" % 2 === 0)
            .select(lit(1).as("v"), $"o_orderkey", $"o_totalprice")
            .write.mode("overwrite").parquet(s"$root/gen1")
          o.filter($"o_orderkey" % 2 === 1)
            .select(lit(2).as("v"), $"o_orderkey", $"o_totalprice",
              $"o_orderpriority")
            .write.mode("overwrite").parquet(s"$root/gen2")
          done.createNewFile()
        }
      }
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen1", s"$root/gen2")
  }

  val schemaEvolutionSql: String =
    """WITH e AS (
      |  SELECT 1 AS v, o_totalprice, NULL AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 2 AS v, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT v, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_with_priority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM e GROUP BY v ORDER BY v""".stripMargin

  /** Generated calendar dimension over the orders date range — the
    * date spine every warehouse keys time rollups and gap-fills
    * against, produced by `sequence()` (a generator, zero input
    * scan). Day-of-week is emitted in ISO numbering (1=Monday)
    * computed EXPLICITLY from Spark's Sunday-first `dayofweek` so the
    * cross-engine day-numbering trap (Spark 1=Sun, DuckDB isodow
    * 1=Mon) is resolved in one audited place rather than at every
    * call site. `sfDir` is unused — the dimension is synthesized. */
  def dateDim(spark: SparkSession, sfDir: String,
              start: String = "1995-01-01",
              end: String = "2001-12-31"): DataFrame = {
    import spark.implicits._
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)),
        expr("interval 1 day"))).as("day"))
      .select($"day",
        year($"day").cast("bigint").as("y"),
        month($"day").cast("bigint").as("m"),
        dayofmonth($"day").cast("bigint").as("d"),
        quarter($"day").cast("bigint").as("q"),
        dayofyear($"day").cast("bigint").as("doy"),
        (((dayofweek($"day") + 5) % 7) + 1).cast("bigint").as("iso_dow"))
      .withColumn("is_weekend", $"iso_dow" >= 6L)
      .orderBy($"day")
  }

  def dateDimSql(start: String = "1995-01-01",
                 end: String = "2001-12-31"): String =
    s"""SELECT day, CAST(date_part('year', day) AS BIGINT) AS y,
       |  CAST(date_part('month', day) AS BIGINT) AS m,
       |  CAST(date_part('day', day) AS BIGINT) AS d,
       |  CAST(date_part('quarter', day) AS BIGINT) AS q,
       |  CAST(date_part('doy', day) AS BIGINT) AS doy,
       |  CAST(isodow(day) AS BIGINT) AS iso_dow,
       |  isodow(day) >= 6 AS is_weekend
       |FROM (SELECT CAST(unnest(generate_series(DATE '$start',
       |        DATE '$end', INTERVAL 1 DAY)) AS DATE) AS day)
       |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // src_range_layout — sketch-driven balanced range partitioning
  // ---------------------------------------------------------------

  /** Range-layout planner: pick range-partition split points on
    * `n_chars` from a BOUNDED global sample and audit the balance of
    * the resulting 4 buckets (row count + min/max per bucket). This
    * is how a distributed writer lays out a range-partitioned 100-TB
    * table without the global sort Spark's own `repartitionByRange`
    * hides (its internal RangePartitioner does exactly this — a
    * reservoir sample then split points — but engine-internally):
    * one bounded-sample pass picks the p25/50/75 boundaries, one
    * scan assigns buckets. The sample is the quantile-sketch sample
    * (bottom-`s` by engine-neutral md5(doc_id), retained map-side by
    * the partial [[graft.plans.TopKPerKey]] heaps — ≤ s rows per
    * task cross the wire even with ONE global group), so every split
    * point and bucket count replays integer-exact in the oracle.
    * The split frame is a 1-row broadcast; nothing corpus-sized
    * reaches the driver. */
  def rangeLayout(spark: SparkSession, sfDir: String, s: Int = 256): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val keyed = d.select($"doc_id", $"n_chars",
      graft.functions.Hashing.md5i32($"doc_id".cast("string"), 23).as("h"),
      lit(1).as("g"))
    val samp = org.apache.spark.sql.GraftSqlBridge.topKPerKey(
      keyed, Seq(keyed("g")), Seq(keyed("h").asc, keyed("doc_id").asc), s)
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"n_chars".asc, $"doc_id".asc)
    def splitAt(p: Int) =
      max(when($"vr" === expr(s"(m * $p + 99) div 100"), $"n_chars"))
        .as(s"v$p")
    val splits = samp
      .withColumn("vr", row_number().over(byVal).cast("long"))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
      .agg(splitAt(25), splitAt(50), splitAt(75))
    d.crossJoin(broadcast(splits))
      .withColumn("bucket",
        when($"n_chars" <= $"v25", 0L).when($"n_chars" <= $"v50", 1L)
          .when($"n_chars" <= $"v75", 2L).otherwise(3L))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .orderBy($"bucket")
  }

  def rangeLayoutSql(s: Int = 256): String = {
    val h = graft.functions.Hashing.md5i32Sql("CAST(doc_id AS VARCHAR)", 23)
    def splitAt(p: Int) =
      s"MAX(CASE WHEN vr = (m * $p + 99) // 100 THEN n_chars END) AS v$p"
    s"""WITH d AS (SELECT doc_id, n_chars, $h AS hh FROM documents),
       |r AS (SELECT doc_id, n_chars,
       |        row_number() OVER (ORDER BY hh, doc_id) AS rk
       |      FROM d),
       |v AS (SELECT n_chars,
       |        row_number() OVER (ORDER BY n_chars, doc_id) AS vr,
       |        COUNT(*) OVER () AS m
       |      FROM r WHERE rk <= $s),
       |sp AS (SELECT ${splitAt(25)}, ${splitAt(50)}, ${splitAt(75)} FROM v),
       |b AS (SELECT CASE WHEN n_chars <= v25 THEN 0
       |                  WHEN n_chars <= v50 THEN 1
       |                  WHEN n_chars <= v75 THEN 2 ELSE 3 END AS bucket,
       |             n_chars
       |      FROM documents, sp)
       |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
       |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------
  // src_compaction_plan — small-partition coalescing plan
  // ---------------------------------------------------------------

  /** Target output-file size for the compaction plan, in rows. */
  val CompactTargetRows = 1000L

  /** Compaction plan for a date-partitioned order table: assign the
    * (small) daily partitions, in calendar order, to output files of
    * ~[[CompactTargetRows]] rows — file k takes the days whose
    * cumulative row count lands in [k·target, (k+1)·target). The
    * maintenance pass every partitioned lake needs: thousands of
    * small daily files become a bounded set of right-sized ones,
    * and CONTIGUITY is preserved so date-range pruning still works
    * on the compacted layout. Emits per output file: day span, day
    * count, and rows — the manifest a rewrite job executes.
    *
    * Determinism: integer row counts, integer floor division on the
    * EXCLUSIVE cumulative sum (a day never splits across files —
    * the greedy sequential rule, exact in both engines). Scale: one
    * date-keyed corpus aggregate, one bounded window over the
    * calendar frame, one group per output file. */
  def compactionPlan(spark: SparkSession, sfDir: String,
                     target: Long = CompactTargetRows): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    daily
      .withColumn("before", coalesce(sum($"n").over(w), lit(0L)))
      .select(expr(s"before DIV $target").as("file_id"), $"day", $"n")
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_days"), sum($"n").as("n_rows"),
        min($"day").as("day_lo"), max($"day").as("day_hi"))
      .orderBy($"file_id")
  }

  def compactionPlanSql(target: Long = CompactTargetRows): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1),
       |c AS (
       |  SELECT day, n,
       |    CAST(COALESCE(SUM(n) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS before
       |  FROM daily)
       |SELECT before // $target AS file_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_days,
       |  CAST(SUM(n) AS BIGINT) AS n_rows,
       |  MIN(day) AS day_lo, MAX(day) AS day_hi
       |FROM c GROUP BY 1 ORDER BY file_id""".stripMargin
}
