package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.RawAsset

/** Unit tests for the multimodal binary-column plumbing (stubbed decode,
  * real schema/chunking/partition-batch shape). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fromText: modality round-robin, payload is the UTF-8 bytes") {
    val df = Seq((0L, "abc"), (1L, "de"), (2L, "f"), (3L, "g"))
      .toDF("doc_id", "text")
    val rows = MultimodalOps.fromText(df, "doc_id", "text")
      .orderBy("asset_id").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("image", "audio", "video", "image"))
    assert(new String(rows(0).getAs[Array[Byte]](2), "UTF-8") == "abc")
  }

  test("chunks: fixed-size frames cover the payload exactly") {
    val df = Seq((1L, "a" * 70)).toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("content"))
    val ch = df.select(MultimodalOps.chunks(col("content"), 32).as("c"))
      .head.getSeq[Array[Byte]](0)
    assert(ch.map(_.length).toSeq == Seq(32, 32, 6)) // 70 = 32+32+6
  }

  test("frameSample keeps every Nth frame with its index") {
    val df = Seq((1L, "x" * 100)).toDF("id", "text")
      .withColumn("content", encode(col("text"), "UTF-8"))
    val frames = MultimodalOps.frameSample(df, col("content"), 10, 3)
      .select("frame_idx").as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 3, 6, 9)) // 10 frames, every 3rd
  }

  test("decodePartitions: stub decoder is deterministic over partitions") {
    val ds = Seq(
      RawAsset(1L, "image", "abc".getBytes("UTF-8")),
      RawAsset(2L, "audio", Array.emptyByteArray)).toDS.repartition(2)
    val out = MultimodalOps.decodePartitions(ds).collect()
      .sortBy(_.asset_id)
    // 'a'=97,'b'=98,'c'=99: sum 294; hist buckets 1,2,3 each get 1/3
    assert((out(0).asset_id, out(0).modality, out(0).n_bytes,
      out(0).checksum) == (1L, "image", 3, 294L))
    assert(out(0).features.toSeq ==
      Seq(0f, 1f / 3, 1f / 3, 1f / 3, 0f, 0f, 0f, 0f))
    assert(out(1).n_bytes == 0 && out(1).checksum == 0L)
  }
}
