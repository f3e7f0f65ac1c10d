package graft.sinks

import org.apache.spark.sql.DataFrame

/** S7 — the reference's presentation sink: query result → Graphviz
  * DOT digraph (`Code/movie_graph.erl:42-93`,
  * `Code/actor_graph.erl:42-95`). The reference renders a root box
  * (the searched title/actor, lightblue) chained to four level boxes
  * (lightgrey), each labeled "Count: N" plus one line per member,
  * then shells out to `dot -Tpng`.
  *
  * Kept strictly OUT of the query path: formatting collects the
  * (level, name) rows driver-side — bounded output, presentation
  * edge only — exactly as SURVEY §2.1/S7 prescribes. Deviations from
  * the reference, both deterministic improvements: nodes are emitted
  * in level order (digraph:vertices order is unspecified ETS order),
  * and members are sorted (the reference emits map-iteration order).
  * PNG rendering (`os:cmd("dot -Tpng …")`, movie_graph.erl:91-93) is
  * available as an OPT-IN: [[writeDotFileRendered]] shells out to
  * `dot` exactly like the reference when the binary is on PATH, and
  * degrades to DOT-text-only when it isn't (this engine never
  * requires Graphviz to answer queries).
  */
object DotGraph {

  // backslash first, then quotes — otherwise a trailing backslash in
  // a title escapes the label's closing quote and the DOT is invalid
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** DOT digraph from per-level member lists. All four levels are
    * emitted even when empty — the reference's master always returns
    * the full `[{level1,…},…,{level4,…}]` envelope
    * (`Code/master.erl:184`). */
  def levelBoxDot(rootLabel: String, levels: Map[Int, Seq[String]]): String = {
    val sb = new StringBuilder
    sb ++= "digraph MovieGraph {\n"
    sb ++= "  rankdir=LR;\n"
    sb ++= s"""  "level0" [label="${esc(rootLabel)}", shape=box, style=filled, fillcolor=lightblue];\n"""
    (1 to 4).foreach { l =>
      val members = levels.getOrElse(l, Seq.empty).sorted
      val label = (s"Count: ${members.size}" +: members).map(esc).mkString("\\n")
      sb ++= s"""  "level$l" [label="$label", shape=box, style=filled, fillcolor=lightgrey];\n"""
    }
    // the reference chains levels: level0 -> level1 -> ... -> level4
    // (process_levels threads each level node as the next parent,
    // movie_graph.erl:27-34)
    (0 until 4).foreach { l =>
      sb ++= s"""  "level$l" -> "level${l + 1}";\n"""
    }
    sb ++= "}\n"
    sb.toString
  }

  /** Format a `titleLevels`/`actorCoactors` result frame
    * (`name`,`level` columns) as the reference's graph. The collect
    * is the presentation edge — level membership is already bounded
    * by the query. */
  def fromLevels(result: DataFrame, rootLabel: String): String = {
    val rows = result.select("level", "name").collect()
    val byLevel = rows.groupBy(_.getLong(0).toInt)
      .map { case (l, rs) => l -> rs.map(_.getString(1)).toSeq }
    levelBoxDot(rootLabel, byLevel)
  }

  /** Write DOT text to a file (the `generate_dot_file` analogue). */
  def writeDotFile(dot: String, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), dot)
    ()
  }

  /** True when the Graphviz `dot` binary is runnable on PATH. */
  def dotAvailable: Boolean =
    try {
      val p = new ProcessBuilder("dot", "-V")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** Full S7 parity: write the DOT file, then render `<path>.png` via
    * `dot -Tpng` when Graphviz is available (the reference shells out
    * unconditionally, `Code/movie_graph.erl:91-93`). Returns the PNG
    * path if rendered, None when `dot` is absent — never fails the
    * query path over a missing presentation tool. */
  def writeDotFileRendered(dot: String, path: String): Option[String] = {
    writeDotFile(dot, path)
    if (!dotAvailable) None
    else {
      val png = s"$path.png"
      val p = new ProcessBuilder("dot", "-Tpng", "-o", png, path)
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      if (p.waitFor() == 0) Some(png) else None
    }
  }
}
