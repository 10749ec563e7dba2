package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps => D, TextOps => T}

/** Throwaway diagnostic: q39 cold-path cost breakdown (r4). */
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
    val raw = Tables(spark, sfDir, "documents")
    val tgt = spark.sparkContext.defaultParallelism
    val docs = (if (raw.rdd.getNumPartitions < tgt) raw.repartition(tgt)
                else raw).select(col("doc_id"), col("text"))
    val sh = T.charShingles(col("text"), 8)
    // warm IO + codegen
    materialize(docs.select(col("doc_id"), length(col("text")).as("l")))
    docs.select(avg(length(col("text")))).show()
    println("[probe] n_docs = " + docs.count())
    time("shingles only", materialize(
      docs.select(col("doc_id"), size(sh).as("n"))))
    time("shingles no-distinct", materialize(
      docs.select(col("doc_id"), size(transform(
        sequence(lit(1), length(col("text")) - 7),
        i => col("text").substr(i, lit(8)))).as("n"))))
    time("minhash sigs (composable)", materialize(
      D.minhashSignatures(docs, "doc_id", sh)))
    time("minhash sigs (fused kernel)", materialize(
      docs.select(col("doc_id"),
        call_function("char_minhash_sig", col("text"), lit(8)))))
    time("bands", materialize(
      D.lshBands(D.minhashSignatures(docs, "doc_id", sh), "doc_id")))
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val (pairs, cached) = D.nearDupPairsTracked(docs, "doc_id", sh, 0.7,
        Some(D.charKernels(col("text"), 8)))
      val cand = cached(1)
      time(s"candidates #$i", println("[probe] n_cand = " + cand.count()))
      time(s"candDocs #$i", println("[probe] n_canddocs = " + cached(2).count()))
      time(s"verify-after-cand #$i", materialize(pairs))
      cached.foreach(_.unpersist(blocking = true))
    }
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      time(s"full q39 #$i", materialize(
        D.nearDupPairs(docs, "doc_id", sh, 0.7,
        Some(D.charKernels(col("text"), 8)))))
    }
    spark.stop()
  }
}
