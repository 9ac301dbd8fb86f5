package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated star schema.
  * Reads are lazy scans — Catalyst pushes filters/projections into the
  * parquet reader, so callers should never pre-materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
