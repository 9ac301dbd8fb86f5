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
      // Deliberate join strategy (opt guide §3.1/§9): prefer the
      // sort-free shuffled-hash join when the planner's size conditions
      // hold, let AQE convert sort-merge to shuffled-hash at runtime
      // when every post-shuffle partition's build side fits 64 MB, and
      // raise the broadcast threshold to 32 MB (estimates after filters
      // routinely undershoot; the gated() hints still pin the hot
      // iterative paths explicitly). All three are size-conditioned by
      // the planner itself, so they scale past local mode unchanged —
      // overridable per-session like any conf.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
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
