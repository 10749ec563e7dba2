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
    * and swapped in (a parquet path cannot be overwritten while read). */
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
    combined.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"rename $tmp -> $target failed")
  }
}
