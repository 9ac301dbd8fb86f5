package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Global 100 TB-safety sweep: an unconditioned Join (cross product)
  * in ANY registered query is a scale bug unless (a) one side is a
  * scalar — a grouping-key-free Aggregate or a plan the optimizer
  * knows is ≤1 row — i.e. the "broadcast one corpus total to every
  * row" idiom, or (b) the operator's CONTRACT is brute-force and says
  * so (the exact baselines that anchor the LSH/IVF/PQ scale paths).
  * Per-op plan audits live in PlanAuditSpec; this is the net under
  * all 164 of them so a future operator can't quietly ship a
  * cartesian. */
class CrossJoinSweepSpec extends AnyFunSuite {
  import TestSession._

  /** Deliberate brute-force contracts (each documents its scale path). */
  private val bruteForce = Set(
    "s_ann_topk",        // exact baseline; LSH/IVF/PQ are the scale path
    "s_mmr",             // relevance pass = the s_ann_topk plan
    "s_ann_recall",      // composes the exact baseline by definition
    "d_dedup_embedding", // exact O(n²) baseline; LSH twin is the scale path
    "s_ann_filtered",    // exact within-predicate baseline
    "s_range_search",    // exact fixed-radius baseline; LSH candidates at scale
    "s_range_recall",    // composes the exact radius baseline by definition
    "s_binary_quant",    // brute scan over the 16-byte/vec signature table
                         // (32x smaller than the corpus); banded LSH beyond
    "s_quant_eval",      // composes the exact baseline by definition
    "s_ivf_multiprobe",  // probe-side cell RANKING = crossJoin of the probe
                         // set against the k=8 broadcast centroids (the IVF
                         // assign shape, linear in probes); the candidate
                         // scan itself is a cid-keyed equi-join. annIvf runs
                         // the same ranking behind ivfAssign's cache leaf.
    "s_ivf_probe_curve", // the same probe×centroid ranking cross as
                         // s_ivf_multiprobe, swept once across the nprobe
                         // configs; candidate scans stay cid-keyed equi-joins.
    "s_ivf_filtered",    // the same probe×centroid cell-ranking cross as
                         // s_ivf_multiprobe; pre/post-filter paths are both
                         // windows over the cid-pruned scored frame.
    "s_ivf_pq",          // the same probe×centroid cell-ranking cross as
                         // s_ivf_multiprobe (10 probes × k=8 broadcast
                         // centroids); the candidate scan is cid-pruned and
                         // the ADC joins are (cand_id)/(m, code) equi-joins.
    "s_kmeanspp_seed",   // farthest-first rounds = O(n·k) crossJoin against
                         // the ≤4 BROADCAST chosen-seed constants — the same
                         // linear d_kmeans_eval assignment shape; each round's
                         // pick is a 1-row TakeOrderedAndProject.
    "d_kmeans_eval"      // Lloyd assignment = O(n·k) crossJoin against the
                         // k=8 BROADCAST CENTROID CONSTANTS — the IVF/k-means
                         // map-side shape, linear in the corpus. The same
                         // join sits inside d_kmeans_cluster/d_semdedup but
                         // behind their cache() leaf; the eval reads the
                         // uncached trajectory, so the sweep sees it here.
  )

  private def isScalar(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1) || (p match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _ => p.children.exists(c => p.outputSet.subsetOf(c.outputSet) && isScalar(c))
    })

  test("no registered query cross-joins two non-scalar sides (brute-force baselines excepted)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if bruteForce(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect {
          case j: Join if j.condition.isEmpty
            && !isScalar(j.left) && !isScalar(j.right) => j
        }
        if (bad.isEmpty) None else Some(s"$name (${bad.size} cross join(s))")
    }
    assert(offenders.isEmpty,
      s"unconditioned cross joins outside the brute-force whitelist:\n  ${offenders.mkString("\n  ")}")
  }
}
