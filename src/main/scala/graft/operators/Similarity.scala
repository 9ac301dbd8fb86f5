package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2 D-block, `s_ann_topk`).
  *
  * Baseline: brute-force cosine top-k per probe. Ranking is by an
  * integer score monotone in cosine — sign(dot)·⌊1000·dot²/‖b‖²⌋ —
  * computed on round(x·1000) quantized BIGINT vectors, so Spark and
  * DuckDB rank identically (float cosine would drift and flip
  * row_number at ties).
  *
  * Scale path: `lshBuckets` — deterministic random-hyperplane signatures
  * (±1 planes derived from md5 parity, exact integer dots). At 100 TB a
  * probe joins only its bucket; here it's spec-tested and benchmarked,
  * the oracle-checked query stays brute-force (exact semantics).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x =>
        floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))

  private def dot(x: Column, y: Column): Column =
    graft.functions.VectorExprs.dotL(x, y) // codegen'd native expression

  // ---------------------------------------------------------- s_ann_topk
  /** Top-5 neighbors for probes vec_id < 10. The probe side is tiny →
    * broadcast; per-candidate work is one codegen'd array dot product;
    * the window sees only (n_probes × n_candidates) rows partitioned by
    * probe. */
  val annK = 5

  def annTopk: Q = (s, dir) => {
    val q = quantized(s, dir)
    val probes = broadcast(q.filter(col("vec_id") < 10).toDF("probe_id", "qp"))
    val scored = probes.crossJoin(q.toDF("cand_id", "qc"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        dot(col("qp"), col("qc")).as("dp"),
        dot(col("qc"), col("qc")).as("nb"))
      // `div`, not `/`: Spark `/` on BIGINTs is DOUBLE division and the
      // cast-back truncation only matches DuckDB's exact integer `//`
      // below 2^53 — dp²·1000 reaches ~4×10¹⁸. `div` is exact BIGINT
      // floor division in both engines (same fix as pagerank).
      .select(col("probe_id"), col("cand_id"),
        expr("CASE WHEN dp >= 0 THEN (dp * dp * 1000) div nb" +
          " ELSE -((dp * dp * 1000) div nb) END").as("score"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= annK)
      .select(col("probe_id"), col("rn"), col("cand_id"), col("score"))
      .orderBy("probe_id", "rn")
  }

  val annTopkSql: String =
    s"""WITH q AS (
       | SELECT vec_id, list_transform(embedding,
       |   x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
       | FROM embeddings
       |), scored AS (
       | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |  CASE WHEN CAST(list_dot_product(p.qe, c.qe) AS BIGINT) >= 0
       |   THEN (CAST(list_dot_product(p.qe, c.qe) AS BIGINT) * CAST(list_dot_product(p.qe, c.qe) AS BIGINT) * 1000)
       |        // CAST(list_dot_product(c.qe, c.qe) AS BIGINT)
       |   ELSE -((CAST(list_dot_product(p.qe, c.qe) AS BIGINT) * CAST(list_dot_product(p.qe, c.qe) AS BIGINT) * 1000)
       |        // CAST(list_dot_product(c.qe, c.qe) AS BIGINT))
       |  END AS score
       | FROM q p, q c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id
       |)
       |SELECT probe_id, rn, cand_id, score FROM (
       | SELECT probe_id, cand_id, score,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rn
       | FROM scored
       |) WHERE rn <= $annK ORDER BY probe_id, rn""".stripMargin

  // ------------------------------------------------------- LSH scale path
  /** Random-hyperplane LSH signatures: plane p component i is ±1 by the
    * parity of the first hex nibble of md5("p|i") — deterministic, no
    * RNG, exact integer dot signs. `nPlanes` sign bits → bucket id.
    * At scale: build once, bucket-join probes — turns ANN from O(n·m)
    * into O(n·m/2^nPlanes) per table. */
  def lshBuckets(s: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val q = quantized(s, dir)
    // plane matrix as a literal array of arrays: tiny, broadcast by value
    val planes: Seq[Seq[Long]] = (0 until nPlanes).map { p =>
      (0 until 64).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$i".getBytes("UTF-8"))
        if ((hex(0) & 1) == 0) 1L else -1L
      }
    }
    val planeCols = planes.map(pl => array(pl.map(lit): _*))
    val sigBits = planeCols.zipWithIndex.map { case (pl, idx) =>
      when(dot(col("qe"), pl) >= 0, lit(1L << idx)).otherwise(lit(0L))
    }
    q.withColumn("bucket", sigBits.reduce(_ + _))
  }

  /** Bucketed ANN: probes join ONLY their bucket. Candidate recall is
    * the LSH contract; ranking within bucket uses the same exact integer
    * score as annTopk. */
  def annTopkLsh(s: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val b = lshBuckets(s, dir, nPlanes)
    val probes = broadcast(b.filter(col("vec_id") < 10)
      .toDF("probe_id", "qp", "bucket"))
    val cands = b.toDF("cand_id", "qc", "bucket")
    val scored = probes.join(cands, "bucket")
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        dot(col("qp"), col("qc")).as("dp"),
        dot(col("qc"), col("qc")).as("nb"))
      .select(col("probe_id"), col("cand_id"),
        expr("CASE WHEN dp >= 0 THEN (dp * dp * 1000) div nb" +
          " ELSE -((dp * dp * 1000) div nb) END").as("score"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= annK)
      .select(col("probe_id"), col("rn"), col("cand_id"), col("score"))
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map("s_ann_topk" -> annTopk)
  val oracleSql: Map[String, String] = Map("s_ann_topk" -> annTopkSql)
}
