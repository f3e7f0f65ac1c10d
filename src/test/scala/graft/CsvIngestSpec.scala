package graft

import graft.functions.TextFunctions
import graft.sources.Ingest
import java.nio.file.{Files, Paths}

/** CSV parse semantics parity with the reference's quote-aware parser
  * (`Code/dataAnalyze.erl:42-114`): quoted fields containing commas,
  * `""` escapes, blank-line skipping, Unicode whitespace trim
  * (`Code/mapReduce.erl:146-148`).
  */
class CsvIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(Paths.get(dir, "movies.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir + "/movies.csv"
  }

  test("quoted field with comma stays one actor (dataAnalyze.erl:72-95)") {
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1,Actor2",
      "1,Heat,\"De Niro, Robert\",Pacino"))
    val row = Ingest.readMoviesCsv(spark, path)
      .select($"title", $"actors").as[(String, Seq[String])].head()
    assert(row == (("Heat", Seq("De Niro, Robert", "Pacino"))))
  }

  test("escaped double quote inside quoted field") {
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1",
      "1,\"The \"\"Best\"\" Movie\",Someone"))
    val row = Ingest.readMoviesCsv(spark, path)
      .select($"title").as[String].head()
    assert(row == "The \"Best\" Movie")
  }

  test("variable actor arity: missing trailing fields dropped, not null") {
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1,Actor2,Actor3",
      "1,Solo,OneActor,,",
      "2,Trio,A,B,C"))
    val got = Ingest.readMoviesCsv(spark, path)
      .select($"title", $"actors").as[(String, Seq[String])].collect().toMap
    assert(got("Solo") == Seq("OneActor"))
    assert(got("Trio") == Seq("A", "B", "C"))
  }

  test("unicode whitespace trimmed like Erlang [[:space:]] (mapReduce.erl:146-148)") {
    val df = Seq("   padded name 　").toDF("s")
      .select(TextFunctions.trimU($"s").as("t")).as[String]
    assert(df.head() == "padded name")
  }

  test("tokenizeActors: split + trim + drop empties (string:tokens semantics)") {
    val df = Seq("A, B ,,C,  ,").toDF("s")
      .select(TextFunctions.tokenizeActors($"s").as("a")).as[Seq[String]]
    assert(df.head() == Seq("A", "B", "C"))
  }

  test("capped read takes the FIRST n file lines, not the n smallest keys") {
    // ids deliberately unordered: a key-order cap would pick 1 and 2;
    // the reference's csv_to_ets.erl cap must pick 9 and 5
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1",
      "9,Ninth,A",
      "5,Fifth,B",
      "1,First,C",
      "2,Second,D"))
    val got = Ingest.readMoviesCsvCapped(spark, path, 2)
      .select($"id").as[String].collect().toSet
    assert(got == Set("9", "5"))
  }

  test("cap counts raw lines BEFORE the blank-line filter (csv_to_ets.erl order)") {
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1",
      "9,Ninth,A",
      ",,", // blank-ish line inside the capped window
      "5,Fifth,B",
      "1,First,C"))
    // cap=3 covers lines {9, blank, 5}; the filter then drops the blank
    val got = Ingest.readMoviesCsvCapped(spark, path, 3)
      .select($"id").as[String].collect().toSet
    assert(got == Set("9", "5"))
  }

  test("csv round-trip over the movies view is lossless at sf0.001") {
    val rt = Ingest.csvRoundTrip(spark, sf)
    val direct = graft.sources.Tables.movies(spark, sf)
      .selectExpr("title", "cast(size(actors) as bigint) as n_actors")
    assert(rt.count() == direct.count())
    assert(rt.except(direct).count() == 0 && direct.except(rt).count() == 0)
  }

  test("golden end-to-end: IMDb-shaped CSV through Ingest -> titleLevelsOn " +
    "matches hand-computed levels (S1-vs-S2 resolution, SURVEY §3.3)") {
    // Every parser hazard in one file: quoted title WITH a comma (the
    // S1/S2 divergence — csv_to_ets.erl:47's quote-blind split would
    // fragment it and the probe lookup would miss), a quoted actor
    // with a comma, an RFC "" escape, variable arity with trailing
    // empties, a blank-ish line (S4), and padded whitespace (F2).
    val path = writeCsv(Seq(
      "MovieID,Title,Actor1,Actor2,Actor3",
      "1,\"Heat, The Remake\",\"De Niro, Robert\", Pacino ,Kilmer",
      "2,Ronin,\"De Niro, Robert\",Reno,",
      "3,Serpico,Pacino,,",
      ",,",
      "4,The Score,\"De Niro, Robert\",Norton,Brando",
      "5,Insomnia,Pacino,Williams,Swank",
      "6,\"The \"\"Irishman\"\"\",\"De Niro, Robert\",Pacino,Pesci"))
    val movies = Ingest.readMoviesCsv(spark, path)
    // S2 parsing holds the comma-title together, so the probe HITS —
    // under the reference's S1 master parser this same query would
    // return empty (title fragments to `"Heat`). We pin S2 (SURVEY
    // §3.3: one parser, the correct one, for both paths).
    val got = graft.operators.ReferenceQueries
      .titleLevelsOn(movies, "Heat, The Remake")
      .as[(String, Long, Long)].collect().toSeq
    // Hand-computed: probe cast {De Niro Robert, Pacino, Kilmer};
    // overlap 1 ⇒ level 1 for Ronin/Serpico/The Score/Insomnia,
    // overlap 2 ⇒ level 2 for The "Irishman"; (level, name) order.
    assert(got == Seq(
      ("Insomnia", 1L, 1L),
      ("Ronin", 1L, 1L),
      ("Serpico", 1L, 1L),
      ("The Score", 1L, 1L),
      ("The \"Irishman\"", 2L, 2L)))
    // the same file through the Actor query: co-stars of Pacino,
    // trimmed ("` Pacino `" on row 1 must have been F2-trimmed to
    // match) — counts are co-appearances, capped into levels
    val co = graft.operators.ReferenceQueries
      .actorCoactorsOn(movies, "Pacino")
      .as[(String, Long, Long)].collect().toSeq
    assert(co == Seq(
      ("Kilmer", 1L, 1L),
      ("Pesci", 1L, 1L),
      ("Swank", 1L, 1L),
      ("Williams", 1L, 1L),
      ("De Niro, Robert", 2L, 2L)))
  }

  test("quarantine captures exactly the planted corrupt lines, clean rows intact") {
    val row = Ingest.csvQuarantine(spark, sf).collect().head
    val nation = graft.sources.Tables.nation(spark, sf)
    assert(row.getLong(0) == nation.count(), "every clean row survives")
    assert(row.getLong(1) == Ingest.QuarantineBadLines.toLong,
      "every planted corrupt line lands in quarantine, none dropped")
    val keySum = nation.selectExpr("cast(sum(n_nationkey) as bigint)")
      .collect().head.getLong(0)
    assert(row.getLong(2) == keySum, "corrupt rows contaminate no aggregate")
  }

  test("date dim: known anchors, leap year, ISO day numbering") {
    import java.sql.Date
    val dim = Ingest.dateDim(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(dim.size == 2557, "1995-01-01..2001-12-31 inclusive")
    // 2000-01-01 was a Saturday (ISO dow 6, weekend), Q1, doy 1
    assert(dim("2000-01-01") == ((2000L, 1L, 1L, 1L, 1L, 6L, true)))
    // leap year: 2000-12-31 is day-of-year 366, a Sunday
    assert(dim("2000-12-31") == ((2000L, 12L, 31L, 4L, 366L, 7L, true)))
    // 2001-12-31 was a Monday (ISO dow 1, weekday)
    assert(dim("2001-12-31")._6 == 1L && !dim("2001-12-31")._7)
  }
}
