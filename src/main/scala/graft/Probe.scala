package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: plan audit for the round's new/hot queries —
  * prints the formatted physical plan plus scan/exchange counts so the
  * shuffle posture is read off the plan, not assumed. */
object Probe {
  private def materialize(df: DataFrame): Unit = {
    val cols = df.columns.map(c => col(c).cast("string"))
    df.select(xxhash64(cols: _*).as("h")).agg(bit_xor(col("h"))).collect()
  }
  private def time(label: String, f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.local()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q121_bpe_segment", "q122_lm_novelty", "q123_rrf_fusion",
        "q124_temporal_split", "q125_label_agreement")
    names.foreach { n =>
      var df: DataFrame = null
      // eager-localCheckpoint queries do their work HERE, not at
      // materialize — time construction separately
      time(s"$n (construct)", { df = SparkEntry.queries(n)(spark, sfDir) })
      val plan = df.queryExecution.executedPlan.toString
      val scans = "FileScan|BatchScan".r.findAllIn(plan).size
      val exch = "Exchange".r.findAllIn(plan).size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      println(s"[probe] $n: scans=$scans exchanges=$exch reused=$reused")
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Exchange") ||
          l.contains("Join") || l.contains("Aggregate"))
        .map(l => "[probe]   " + l.trim.take(120)).mkString("\n"))
      materialize(df)
      time(s"$n (warm)", materialize(df))
    }
    spark.stop()
  }
}
