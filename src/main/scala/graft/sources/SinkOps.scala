package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.RelationalOps

/** Write path (SURVEY.md §2.1 S6/A2): parquet table loads with the
  * reference's `INSERT ... ON CONFLICT (keys) DO NOTHING` observable
  * semantics (crime_immigration_etl.py:315-331) — existing rows win, new
  * keys append, re-running the same load is a no-op.
  *
  * Scale posture: the conflict check is one left-anti join on the key
  * (shuffle on keys); the rewrite is a full-table write — the same cost
  * any non-transactional parquet upsert pays. At warehouse scale this maps
  * to partition-overwrite or a MERGE-capable format; semantics identical.
  */
object SinkOps {

  /** Idempotent conflict-skip load. Incoming rows are deduped first-wins
    * per key under `order` (deterministic A2), then rows whose key already
    * exists in the table are dropped, the union is written via a temp dir
    * and swapped in (a parquet path cannot be overwritten while read).
    *
    * Crash safety (ADVICE r2): before reading, an interrupted prior swap is
    * recovered — a parked `path__old` with NO live table is the sole
    * surviving copy and is restored (a parked copy alongside a live table
    * is the stale leftover of a COMPLETED swap and is deleted). The swap
    * itself renames the live table aside first and deletes it only after
    * staging renames into place, so a crash at any point leaves a
    * recoverable copy at `path` or `path__old` — never silent loss.
    * SINGLE-WRITER assumption: like any non-transactional file-table swap,
    * concurrent loads to the same path are not coordinated — at warehouse
    * scale this maps onto a MERGE-capable table format or a catalog-level
    * pointer flip. */
  def loadNoConflict(spark: SparkSession, df: DataFrame, path: String,
                     keys: Seq[String], order: Seq[Column]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + "__staging")
    val old = new Path(path + "__old")
    // Recover an interrupted swap FIRST, so the conflict anti-join below
    // always sees the true table state.
    if (fs.exists(old)) {
      if (fs.exists(target)) fs.delete(old, true) // completed swap leftover
      else if (!fs.rename(old, target))
        throw new IllegalStateException(
          s"crash recovery: restore $old -> $target failed")
    }
    val incoming = RelationalOps.dedupFirst(df, keys, order)
    val hadTarget = fs.exists(target)
    val combined = if (hadTarget) {
      val existing = spark.read.parquet(path)
      existing.unionByName(
        incoming.join(existing.select(keys.map(existing(_)): _*),
          keys, "left_anti"))
    } else incoming
    combined.write.mode("overwrite").parquet(tmp.toString)
    if (hadTarget && !fs.rename(target, old))
      throw new IllegalStateException(s"rename $target -> $old failed")
    if (!fs.rename(tmp, target)) {
      // restore the old table before failing — never leave `path` empty
      if (hadTarget) fs.rename(old, target)
      throw new IllegalStateException(s"rename $tmp -> $target failed")
    }
    if (hadTarget) fs.delete(old, true)
  }
}
