package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-call cache hygiene shared by the operator packs. */
private[graft] object Caches {

  /** Materialize `result` (truncating its lineage), then release the
    * per-call caches feeding it — without this every invocation pins
    * its intermediates in executor memory for the session lifetime,
    * evicting the deliberately session-shared graph caches under
    * pressure (the ADVICE-r1 pathsTo leak pattern). The checkpoint must
    * happen BEFORE the unpersist: the result's lineage reads the
    * caches, and releasing first would recompute uncached. */
  def release(result: DataFrame, caches: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    caches.foreach(_.unpersist(blocking = false))
    out
  }
}
