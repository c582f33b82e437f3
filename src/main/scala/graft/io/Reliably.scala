package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One policy for plan-truncating checkpoints (ADVICE r03): `localCheckpoint`
  * stores blocks on EXECUTORS, so losing one (failure, dynamic-allocation
  * reclaim) makes every consumer of the truncated plan unrecoverable — fine
  * in a single JVM, a real risk on the clusters the iterative CC loop and
  * the dedup verification join are built for. When the session has a
  * checkpoint dir configured (`sparkContext.setCheckpointDir` — HDFS/object
  * store on a cluster), the SAME call sites switch to reliable
  * `checkpoint()` automatically; with no dir they keep the zero-I/O local
  * form. Both are EAGER: callers rely on materialize-now semantics.
  *
  * The reliable path persists BEFORE checkpointing and unpersists after:
  * Spark's reliable checkpoint materializes with one job and then writes
  * the checkpoint files with a SECOND job, which recomputes the whole plan
  * from scratch unless the RDD is cached (round-4 review) — persist makes
  * the write job read blocks instead. Checkpoint files accumulate for the
  * life of the application unless `spark.cleaner.referenceTracking
  * .cleanCheckpoints=true` is set (recommended for long iterative runs —
  * a 35-round CC loop otherwise leaves every round's files on the store).
  */
object Reliably {
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist only if the CALLER hasn't: persist() on an already-persisted
      // df is a no-op returning the same Dataset, so unpersisting it here
      // would silently destroy the caller's cache entry and force every
      // other consumer of their df to recompute (round-5 review)
      val own = df.storageLevel == StorageLevel.NONE
      val cached = if (own) df.persist(StorageLevel.MEMORY_AND_DISK) else df
      // finally: a failed checkpoint job (transient FS fault, executor
      // loss) must not strand the persisted blocks — in the 35-round CC
      // loop a retried batch would otherwise leak up to 3 cached plans per
      // failed round (round-5 review)
      try cached.checkpoint(eager = true)
      finally if (own) cached.unpersist()
    } else df.localCheckpoint(eager = true)
}
