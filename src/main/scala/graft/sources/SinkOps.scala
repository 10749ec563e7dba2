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
    * Crash safety (ADVICE r2): the live table is renamed ASIDE first and
    * deleted only after staging renames into place — at no point between
    * is there neither old nor new data reachable; a crash mid-swap leaves
    * either the old table at `path`, or the new table at `path` with the
    * old one parked at `path + "__old"`. SINGLE-WRITER assumption: like
    * any non-transactional file-table swap, concurrent loads to the same
    * path are not coordinated — at warehouse scale this maps onto a
    * MERGE-capable table format or a catalog-level pointer flip. */
  def loadNoConflict(spark: SparkSession, df: DataFrame, path: String,
                     keys: Seq[String], order: Seq[Column]): Unit = {
    val incoming = RelationalOps.dedupFirst(df, keys, order)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val combined = if (fs.exists(target)) {
      val existing = spark.read.parquet(path)
      existing.unionByName(
        incoming.join(existing.select(keys.map(existing(_)): _*),
          keys, "left_anti"))
    } else incoming
    val tmp = new Path(path + "__staging")
    val old = new Path(path + "__old")
    combined.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    val hadTarget = fs.exists(target)
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
