package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Defaults are chosen for reproducibility (UTC, seeded everything downstream)
  * and for scale-out behavior that survives a 1000-executor cluster even though
  * local runs use `local[n]`: AQE on (runtime coalescing + skew-join handling),
  * modest shuffle partitioning locally (the cluster deployment overrides
  * `spark.sql.shuffle.partitions` to ~2-3x total cores).
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      // native graft SQL functions (graft_token_count, ...) available in
      // every graft session; config-based deployments can equivalently set
      // spark.sql.extensions=graft.extensions.GraftExtensions
      .withExtensions(new graft.extensions.GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS); read as long + convert
      // (see Tables.load).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session used by tests and ad-hoc runs. Warehouse (for bucketed
    * managed tables) goes to a temp dir, not the working directory.
    */
  def local(cores: String = "*", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
