package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal accessor for Spark-core internals that are `private[spark]` —
  * the core-side sibling of [[org.apache.spark.sql.graft.Bridge]].
  *
  * `listenerBus.waitUntilEmpty()` drains the async listener bus so that
  * stage-metric accumulators read at a query boundary contain exactly that
  * query's stages: SparkListenerStageCompleted events are delivered
  * asynchronously, so without the flush late events from query N bleed
  * into query N+1's window — misattribution in the one instrument that
  * exists to adjudicate wall-vs-work drift.
  */
object CoreBridge {
  def flushListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Block-manager storage occupancy — (memoryUsedBytes, diskUsedBytes,
    * residentBlocks) of the local executor's stores. Round-17 stall
    * forensics instrument: the xm→successor stall's JFR profile (compiled
    * frames, 5.5× real work, LZ4/ObjectInputStream/HashedRelation churn,
    * zero retries) fits per-task re-materialization of evicted
    * broadcast/cached blocks; this reads the storage pressure the
    * predecessor left behind, per bench window, with no JFR needed. */
  def storageStatus(sc: SparkContext): (Long, Long, Int) = {
    val st = sc.env.blockManager.master.getStorageStatus
    (st.map(_.memUsed).sum, st.map(_.diskUsed).sum,
      st.map(_.blocks.size).sum)
  }
}
