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
}
