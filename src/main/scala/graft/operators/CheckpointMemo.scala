package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped String → materialized-DataFrame memo — the shared
  * "build once per (corpus, session), read many times" discipline behind
  * the heavyweight session sweeps: the near-dup component labels (an
  * iterative [[GraphOps.connectedComponents]] fixpoint whose per-round
  * ACTIONS would re-run for every consumer) and trained k-means
  * centroids ([[VectorOps.kmeansTrain]]'s Lloyd passes). Values are
  * expected to be `localCheckpoint`ed frames; `clear()` releases their
  * executor blocks directly ([[GraphOps.releaseCheckpoint]] —
  * `Dataset.unpersist` is a no-op for LogicalRDD-backed plans). Key
  * discipline: include the corpus dir AND the owning `applicationId`
  * (checkpoint blocks die with their SparkContext; an identity-free key
  * could serve a stopped context's blocks to a colliding later
  * session). */
final class CheckpointMemo {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def apply(key: String)(compute: => DataFrame): DataFrame =
    memo.computeIfAbsent(key, _ => compute)

  def clear(): Unit = {
    memo.values.forEach(GraphOps.releaseCheckpoint)
    memo.clear()
  }

  def size: Int = memo.size
}
