package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkSession factory with the scale-oriented defaults this engine assumes:
  * AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized to
  * local cores (never the 200 default), UTC, no UI. On a real cluster the same
  * builder is fed by spark-submit confs; nothing here is local-only.
  */
object Session {
  def build(master: String = "local[32]", shufflePartitions: Int = 32,
            appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let the planner pick shuffled-hash join where its size conditions
      // hold (guide §9): no sort on either side; SMJ remains the fallback
      // whenever the build side estimate is too large to hash in memory
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Read one of the driver-generated parquet tables under an sf dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
