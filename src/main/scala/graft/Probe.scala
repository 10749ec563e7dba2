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
    println("[probe] n_embeddings = " + e.count())
    val seed = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val trainSet = Sam.hashSample(e, col("vec_id"), 2500, 10000, "ivf")
      .select(col("vec_id"), col("embedding"))
    // warm
    materialize(Vec.kmeansTrain(trainSet, "vec_id", "embedding", seed,
      "cid", "cv", 2))
    time("sample count", println("[probe] n_train = " + trainSet.count()))
    time("train iters=0 (checkpoint seed only)",
      materialize(Vec.kmeansTrain(trainSet, "vec_id", "embedding", seed,
        "cid", "cv", 0)))
    time("train iters=1",
      materialize(Vec.kmeansTrain(trainSet, "vec_id", "embedding", seed,
        "cid", "cv", 1)))
    time("train iters=2",
      materialize(Vec.kmeansTrain(trainSet, "vec_id", "embedding", seed,
        "cid", "cv", 2)))
    val cent = Vec.kmeansTrain(trainSet, "vec_id", "embedding", seed,
      "cid", "cv", 2)
    time("full-corpus assign",
      materialize(Vec.ivfAssign(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, "cid", "cv")))
    spark.stop()
  }
}
