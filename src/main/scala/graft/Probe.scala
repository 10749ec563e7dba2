package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{SampleOps => Sam, VectorOps => Vec}

/** Throwaway diagnostic: q34/q49 trained-IVF cost breakdown (r7). */
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
    val e = Tables(spark, sfDir, "embeddings")
    val seed = e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val trainSet = Sam.hashSample(e, col("vec_id"), 2500, 10000, "ivf")
      .select(col("vec_id"), col("embedding"))
    // warm codegen
    Vec.kmeansTrainLocal(trainSet, "embedding", seed, 2, 64)
    time("local train iters=2 (warm)",
      Vec.kmeansTrainLocal(trainSet, "embedding", seed, 2, 64))
    // one-iteration anatomy: plan build vs execute
    locally {
      val sums = (0 until 64).map(j =>
        sum(element_at(col("embedding"), j + 1).cast("double")).as(s"__s$j"))
      val agg = trainSet
        .groupBy(Vec.nearestCellExpr(col("embedding"), seed).as("__cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
      time("  iter plan build", agg.queryExecution.executedPlan)
      time("  iter execute 1", agg.collect())
      val agg2 = trainSet
        .groupBy(Vec.nearestCellExpr(col("embedding"), seed).as("__cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
      time("  iter rebuild plan", agg2.queryExecution.executedPlan)
      time("  iter execute 2", agg2.collect())
      val tiny = trainSet.groupBy((col("vec_id") % 8).as("__cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
      time("  control plan (no centroid expr)",
        tiny.queryExecution.executedPlan)
      time("  control execute", tiny.collect())
    }
    val cent = Vec.kmeansTrainLocal(trainSet, "embedding", seed, 2, 64)
    val asg = e.select(col("vec_id"), col("embedding"),
      Vec.nearestCellExpr(col("embedding"), cent).as("cell_id"))
    materialize(asg)
    time("assign expr (warm)", materialize(asg))
    val probed = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv"),
        explode(Vec.probeCellsExpr(col("embedding"), cent, 5)).as("cell_id"))
    materialize(probed.drop("__qv"))
    time("probe expr (warm)", materialize(probed.drop("__qv")))
    SparkEntry.clearSessionSweeps()
    time("q34 cold(sweep)",
      materialize(SparkEntry.queries("q34_ann_ivf")(spark, sfDir)))
    time("q34 warm(sweep)",
      materialize(SparkEntry.queries("q34_ann_ivf")(spark, sfDir)))
    SparkEntry.clearSessionSweeps()
    time("q49 cold(sweep)",
      materialize(SparkEntry.queries("q49_ann_recall")(spark, sfDir)))
    time("q49 warm(sweep)",
      materialize(SparkEntry.queries("q49_ann_recall")(spark, sfDir)))
    spark.stop()
  }
}
