package graft

/** Dev utility: run a single SparkEntry query by name, print timing + rows +
  * the formatted physical plan. `runMain graft.RunOne <query> [sfDir] [n]` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Session.build(master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    var rows = 0L
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      rows = fn(spark, dir).count()
      println(f"[$name] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $rows rows")
    }
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
