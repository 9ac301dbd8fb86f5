package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count INDEPENDENCE: a distributed operator must return the
  * same rows whether the cluster runs 32 shuffle partitions or 7, and
  * whatever the input split sizing — anything else means the result
  * depends on physical placement (the classic collect_list /
  * first-in-partition / float-reduction bug class). These specs re-run
  * the most order-SENSITIVE ops (per-doc rebuilds from collect_list,
  * window-ranked selections, banded self-joins, per-level iteration)
  * under deliberately different partitioning and require row-identical
  * output — locally this simulates the executor-count change every
  * real cluster rollout performs. */
class PartitionStabilitySpec extends AnyFunSuite {
  import TestSession._

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private def stable(name: String)(run: => DataFrame): Unit = {
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    val beforeBytes = conf.get("spark.sql.files.maxPartitionBytes")
    val baseline = collectSorted(run)
    try {
      // different shuffle width AND different input splits; drop every
      // cached plan so nothing replays the old physical layout
      spark.sharedState.cacheManager.clearCache()
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val repartitioned = collectSorted(run)
      assert(repartitioned == baseline,
        s"$name depends on physical partitioning: " +
          s"${baseline.size} vs ${repartitioned.size} rows or order drift")
    } finally {
      conf.set("spark.sql.shuffle.partitions", before)
      conf.set("spark.sql.files.maxPartitionBytes", beforeBytes)
      spark.sharedState.cacheManager.clearCache()
      // clearCache also drops the SHARED graph snapshot's registration,
      // which specs running later in the same session rely on (the plan
      // audits assert InMemoryTableScan on point lookups). Re-register
      // it so suite order doesn't leak through this spec.
      val g = graft.model.PropertyGraph.load(spark, sf)
      g.nodes.cache()
      g.edges.cache()
    }
  }

  test("span-rewrite rebuild is partition-stable (collect_list + array_sort)") {
    stable("d_dedup_span_rewrite") {
      graft.operators.Dedup.dedupSpanRewrite(spark, sf)
    }
  }

  test("mixture resample membership is partition-stable (ranked selection)") {
    stable("t_mixture_resample") {
      graft.operators.TextOps.mixtureResample(spark, sf)
    }
  }

  test("phash candidate pairs are partition-stable (banded self-join)") {
    stable("m_phash_dedup") {
      graft.operators.Multimodal.phashDedup(spark, sf)
    }
  }

  test("random walk is partition-stable (per-step deterministic choice)") {
    stable("g_random_walk") {
      graft.operators.Analytics.randomWalk(spark, sf)
    }
  }

  test("KLL sketch is partition-stable (hash survivors + rank selection)") {
    stable("q_quantile_kll") {
      graft.operators.Relational.qQuantileKll(spark, sf)
    }
  }

  test("bootstrap CI is partition-stable (hash multipliers + rank selection)") {
    stable("q_bootstrap_ci") {
      graft.operators.Relational.qBootstrapCi(spark, sf)
    }
  }

  test("concurrency sweep is partition-stable (running sum over a total order)") {
    stable("q_concurrency_peak") {
      graft.operators.Relational.qConcurrencyPeak(spark, sf)
    }
  }

  test("top-supplier ties are partition-stable (DECIMAL max equality)") {
    stable("q15_top_supplier") {
      graft.operators.Relational.q15TopSupplier(spark, sf)
    }
  }

  test("returned-items top-20 cut is partition-stable (exact-integer rank boundary)") {
    stable("q10_returned_items") {
      graft.operators.Relational.q10ReturnedItems(spark, sf)
    }
  }

  test("attribution credit is partition-stable (min/max-struct argselect)") {
    stable("q_attribution") {
      graft.operators.Relational.qAttribution(spark, sf)
    }
  }

  test("burstiness top-30 cut is partition-stable (total-order rank)") {
    stable("t_term_burstiness") {
      graft.operators.TextOps.termBurstiness(spark, sf)
    }
  }

  test("MIS is partition-stable (per-round md5 priorities + struct min)") {
    stable("g_mis") {
      graft.operators.Analytics.mis(spark, sf)
    }
  }

  test("epoch plan is partition-stable (salted rank over the manifest)") {
    stable("m_epoch_plan") {
      graft.operators.Multimodal.epochPlan(spark, sf)
    }
  }
}
