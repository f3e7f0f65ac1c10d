package graft

import graft.operators.ReferenceQueries
import graft.sinks.DotGraph
import org.scalatest.funsuite.AnyFunSuite

class DotGraphSpec extends AnyFunSuite with SparkSpec {

  test("golden DOT output matches the reference graph shape") {
    import spark.implicits._
    val movies = Seq(
      (1L, "root", Seq("a", "b", "c", "d", "e")),
      (2L, "one", Seq("a", "x1", "x2")),  // overlap 1
      (3L, "four", Seq("a", "b", "c", "d")), // overlap 4
      (4L, "also-one", Seq("e", "y1"))    // overlap 1
    ).toDF("id", "title", "actors")
    val dot = DotGraph.fromLevels(
      ReferenceQueries.titleLevelsOn(movies, "root"), "root")
    val expected =
      """digraph MovieGraph {
        |  rankdir=LR;
        |  "level0" [label="root", shape=box, style=filled, fillcolor=lightblue];
        |  "level1" [label="Count: 2\nalso-one\none", shape=box, style=filled, fillcolor=lightgrey];
        |  "level2" [label="Count: 0", shape=box, style=filled, fillcolor=lightgrey];
        |  "level3" [label="Count: 0", shape=box, style=filled, fillcolor=lightgrey];
        |  "level4" [label="Count: 1\nfour", shape=box, style=filled, fillcolor=lightgrey];
        |  "level0" -> "level1";
        |  "level1" -> "level2";
        |  "level2" -> "level3";
        |  "level3" -> "level4";
        |}
        |""".stripMargin
    assert(dot == expected)
  }

  test("actor query renders through the same level-box graph (actor_graph.erl parity)") {
    import spark.implicits._
    val movies = Seq(
      (1L, "m1", Seq("a", "b")),
      (2L, "m2", Seq("a", "b", "c")),
      (3L, "m3", Seq("a", "b"))
    ).toDF("id", "title", "actors")
    val dot = DotGraph.fromLevels(
      ReferenceQueries.actorCoactorsOn(movies, "a"), "a")
    // b co-stars in 3 movies -> level 3; c in 1 -> level 1
    assert(dot.contains(""""level3" [label="Count: 1\nb""""))
    assert(dot.contains(""""level1" [label="Count: 1\nc""""))
    assert(dot.contains(""""level0" [label="a""""))
  }

  test("quotes in titles are escaped") {
    val dot = DotGraph.levelBoxDot("""the "quoted" one""", Map(1 -> Seq("""a"b""")))
    assert(dot.contains("""label="the \"quoted\" one""""))
    assert(dot.contains("""Count: 1\na\"b"""))
  }

  test("writeDotFile round-trips") {
    val p = java.nio.file.Files.createTempFile("graft_dot", ".dot")
    DotGraph.writeDotFile("digraph X {}\n", p.toString)
    assert(java.nio.file.Files.readString(p) == "digraph X {}\n")
  }

  test("rendered write emits DOT always, PNG exactly when dot is on PATH") {
    val p = java.nio.file.Files.createTempFile("graft_dot_png", ".dot")
    val png = DotGraph.writeDotFileRendered("digraph X { a -> b; }\n", p.toString)
    // the DOT text is written unconditionally — full S7 text parity
    assert(java.nio.file.Files.readString(p) == "digraph X { a -> b; }\n")
    if (DotGraph.dotAvailable) {
      // real render: file exists and carries the PNG magic
      assert(png.isDefined)
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(png.get))
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    } else {
      assert(png.isEmpty) // graceful degrade, never an error
    }
  }
}
