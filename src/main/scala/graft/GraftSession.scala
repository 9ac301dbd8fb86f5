package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * Local testing runs `local[32]`; the same conf holds on a real
  * cluster where `spark.sql.shuffle.partitions` is sized to cores and
  * AQE re-plans at runtime (skew joins, dynamic coalescing).
  */
object GraftSession {
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // the same conf-string route a cluster user takes (spark-submit
      // --conf spark.sql.extensions=graft.GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
      // type for — read as BIGINT nanos and do integer time arithmetic.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
