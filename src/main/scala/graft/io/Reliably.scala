package graft.io

import org.apache.spark.sql.DataFrame

/** One policy for plan-truncating checkpoints (ADVICE r03): `localCheckpoint`
  * stores blocks on EXECUTORS, so losing one (failure, dynamic-allocation
  * reclaim) makes every consumer of the truncated plan unrecoverable — fine
  * in a single JVM, a real risk on the clusters the iterative CC loop and
  * the dedup verification join are built for. When the session has a
  * checkpoint dir configured (`sparkContext.setCheckpointDir` — HDFS/object
  * store on a cluster), the SAME call sites switch to reliable
  * `checkpoint()` automatically; with no dir they keep the zero-I/O local
  * form. Both are EAGER: callers rely on materialize-now semantics.
  */
object Reliably {
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
