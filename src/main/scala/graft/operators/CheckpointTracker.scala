package graft.operators

import scala.util.DynamicVariable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Thread-scoped registry of the RDDs a code region `localCheckpoint`'d,
  * so the region's exit can unpersist EXACTLY those.
  *
  * Why not diff `sparkContext.getPersistentRDDs` around the region (the
  * r19 design): that sweeps every id persisted during the window,
  * including a CONCURRENT query's. A localCheckpoint truncates lineage —
  * its blocks are the only copy of the data — so sweeping a concurrent
  * query's checkpoint is not "a re-cache", it makes that query's later
  * reads fail unrecoverably (checkpoint block not found). Explicit
  * registration makes the sweep precise: only frames the region itself
  * checkpointed are freed, and a session shared with ad-hoc queries stays
  * safe with no single-writer caveat.
  *
  * Mechanics: a checkpointed Dataset's analyzed plan is a `LogicalRDD`
  * holding exactly the RDD that `localCheckpoint` persisted (same
  * extraction as `Shim.unpersistCheckpoint`). `ckpt` checkpoints and
  * registers it with the innermost `freeing` scope on this thread —
  * foreachBatch bodies are single-threaded, so every `ckpt` call a batch
  * body makes (directly or through helpers like `Dedup.clusterLabels`)
  * lands in that batch's scope. Outside any scope, `ckpt` is a plain
  * `localCheckpoint` (the gated batch keys keep GC-timed release).
  */
private[graft] object CheckpointTracker {
  private val active = new DynamicVariable[Option[java.util.ArrayDeque[RDD[_]]]](None)

  /** `ds.localCheckpoint()` + register with the innermost scope. */
  def ckpt[T](ds: Dataset[T]): Dataset[T] = register(ds.localCheckpoint())

  /** Storage-level variant (iterative closures use MEMORY_AND_DISK_SER). */
  def ckpt[T](ds: Dataset[T], eager: Boolean, level: StorageLevel): Dataset[T] =
    register(ds.localCheckpoint(eager, level))

  private def register[T](out: Dataset[T]): Dataset[T] = {
    active.value.foreach { buf =>
      out.queryExecution.analyzed.foreach {
        case r: org.apache.spark.sql.execution.LogicalRDD => buf.add(r.rdd)
        case _ =>
      }
    }
    out
  }

  /** Run `body`; on exit (success or failure) unpersist every RDD the
    * body registered via `ckpt`. Unpersist is idempotent, so a frame the
    * body already freed itself (e.g. `clusterLabels`' superseded
    * generations) is a no-op here. */
  def freeing[T](body: => T): T = {
    val buf = new java.util.ArrayDeque[RDD[_]]()
    try active.withValue(Some(buf))(body)
    finally buf.forEach(_.unpersist(blocking = false))
  }
}
