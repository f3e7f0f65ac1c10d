package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke main mirroring the driver's t1 check: `SparkEntry.entry`
  * on sf0.001 must return rows > 0. Prints the plan + first rows so a
  * human can eyeball the flagship query end-to-end.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
