package graft
// temporary diagnostic main (not registered anywhere); removed before round end
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[24]").config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val edges = graft.sources.Tables.coActorEdgesBucketed(spark, dir)
      .select($"src".cast("long").as("src"), $"dst".cast("long").as("dst"))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d")).cache()
    val oriented = edges
      .join(deg.select($"src", $"d".as("ds")), "src")
      .join(deg.select($"src".as("dst"), $"d".as("dd")), "dst")
      .filter($"ds" < $"dd" || ($"ds" === $"dd" && $"src" < $"dst"))
      .select($"src", $"dst").cache()
    println("oriented edges: " + oriented.count())
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val v = f
      println(f"$name: $v in ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    def run(sorted: Boolean): Long = {
      val nbrs = if (sorted) array_sort(collect_list($"dst")) else collect_list($"dst")
      val adj = oriented.groupBy($"src").agg(nbrs.as("nbrs"))
      val c = if (sorted)
        graft.functions.GraphExpressions.sorted_intersect_count($"nu", $"nv")
      else size(array_intersect($"nu", $"nv")).cast("long")
      oriented
        .join(adj.select($"src", $"nbrs".as("nu")), Seq("src"))
        .join(adj.select($"src".as("dst"), $"nbrs".as("nv")), Seq("dst"), "left")
        .select(when($"nv".isNull, lit(0L)).otherwise(c).as("c"))
        .agg(coalesce(sum($"c"), lit(0L))).head().getLong(0)
    }
    time("old-hashset-1")(run(false))
    time("new-merge-1")(run(true))
    time("old-hashset-2")(run(false))
    time("new-merge-2")(run(true))
    spark.stop()
  }
}
