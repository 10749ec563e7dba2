package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, chunking /
  * frame-sampling as native binary expressions, and a partition-batched
  * decode seam.
  *
  * The DECODE ITSELF IS A STUB — this container ships no image/audio codecs
  * (task constraint), so [[stubDecoder]] derives deterministic pseudo
  * features; a real deployment swaps in a codec inside [[decodePartitions]]
  * (the Scala analog of a `mapInPandas` batch UDF: one JVM call per
  * partition iterator, vectorizable batch shape). Everything AROUND the
  * stub — schema, binary expressions, chunk arithmetic, partition batching
  * — is real and oracle-/spec-tested.
  *
  * Scale posture: chunking and hashing are per-row map-side expressions;
  * decodePartitions streams partition iterators (no collect, no per-row JVM
  * boundary); payload columns stay opaque so parquet scans prune them
  * unless a query actually touches `content`.
  */
object MultimodalOps {

  /** Canonical asset schema: opaque payload + modality-typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Corpus adapter: fabricate asset rows from a text table (the corpus
    * ships no real media) — payload = UTF-8 bytes, modality round-robin.
    * Deterministic, so the DuckDB oracle reproduces it byte-for-byte on
    * the string side (the corpus text is pure ASCII). */
  def fromText(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("asset_id"),
      expr(s"CASE pmod($id, 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END").as("modality"),
      encode(col(text), "UTF-8").as("content"))

  /** Payload chunking: fixed-size binary frames (video frame extraction /
    * audio windowing shape). n = (bytes + size - 1) / size, all integer.
    * Empty payloads yield an empty chunk array — the guard is required
    * because Spark's sequence(1, 0) counts DOWN instead of being empty
    * (same trap TextOps.wordShingles documents). */
  def chunks(content: Column, size: Int): Column =
    when(length(content) > 0,
      transform(
        sequence(lit(1),
          ((length(content) + lit(size - 1)) / lit(size)).cast("int")),
        i => content.substr((i - lit(1)) * lit(size) + lit(1), lit(size))))
      .otherwise(array().cast("array<binary>"))

  /** Frame sampling: every `everyNth` chunk, with its frame index —
    * posexplode over the chunk array, filtered by position. */
  def frameSample(df: DataFrame, content: Column, size: Int,
                  everyNth: Int): DataFrame =
    df.select(col("*"), posexplode(chunks(content, size))
        .as(Seq("frame_idx", "frame")))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)

  /** Raw/decoded batch shapes for the partition-wise decode seam. */
  final case class RawAsset(asset_id: Long, modality: String,
                            content: Array[Byte])
  final case class DecodedAsset(asset_id: Long, modality: String,
                                n_bytes: Int, checksum: Long,
                                features: Array[Float])

  /** STUB decoder — deterministic pseudo-decode standing in for a codec:
    * checksum = byte sum, features = 8 byte-histogram buckets normalized.
    * Replace with a real image/audio decode in production. */
  val stubDecoder: RawAsset => DecodedAsset = { a =>
    val bytes = Option(a.content).getOrElse(Array.emptyByteArray)
    val hist = new Array[Float](8)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; sum += u; hist(u % 8) += 1f }
    val n = math.max(bytes.length, 1)
    DecodedAsset(a.asset_id, a.modality, bytes.length, sum,
      hist.map(_ / n))
  }

  /** The mapInPandas-shaped seam: decode a whole partition per JVM call.
    * `mapPartitions` is justified here (SURVEY §2.10 "last resort") — a
    * codec is genuinely imperative per-buffer work no Column expression
    * can express. */
  def decodePartitions(ds: Dataset[RawAsset],
                       decoder: RawAsset => DecodedAsset
                       = stubDecoder): Dataset[DecodedAsset] =
    ds.mapPartitions(_.map(decoder))(Encoders.product[DecodedAsset])
}
