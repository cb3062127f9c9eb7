package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extraction running
  * batched per partition (the Scala analogue of `mapInPandas` — one
  * executor-side loop over an iterator of rows, amortizing any per-batch
  * model/codec setup).
  *
  * The actual codec is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] produces a deterministic fake "decode" from
  * the bytes, so the Spark-side contract — schema, partitioning, batch
  * iteration shape, feature vector type — is real and tested while the
  * stub is one function swap away from a real codec.
  */
object Multimodal {

  /** media table schema: the shape a 100 TB multimodal lake would use
    * (binary payload partition-pruned by kind/date, metadata columns for
    * predicate pushdown without touching bytes).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
  ))

  /** Deterministic fake media table derived from the documents fixture
    * (payload = utf-8 text bytes). Stands in for `spark.read.parquet` of a
    * real media lake.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** STUB decoder: a real implementation would JNI/codec-decode the
    * payload; the stub derives a fixed-size "pixel" summary — a 16-bin
    * histogram of byte values mod 16 — deterministically from the bytes.
    * Same signature a real decoder would have: bytes → fixed-shape floats.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xff) % 16) += 1f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < 16) { bins(j) /= bytes.length; j += 1 } }
    bins
  }

  /** Batched feature extraction over the media table: one partition-level
    * iterator pass (setup cost — e.g. loading a codec or a small model —
    * would be paid once per partition, not per row). Output keeps the
    * metadata and adds `features: array<float>`.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "bytes") :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition setup happens HERE (stub: nothing to set up)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          r.getAs[Int]("width"), r.getAs[Int]("height"),
          decodeStub(bytes).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for "video" payloads: every `step`-th frame index of
    * `n_frames = len/frameBytes + 1` frames, each frame identified by a
    * deterministic content hash (stub: md5 of media_id:idx — a real
    * implementation would hash decoded frame pixels). Pure column
    * expressions: the explode is the real plumbing, the decode is the stub.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("n_frames", (length(col("bytes")).cast("long") / frameBytes).cast("long") + 1)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong))).as("frame_idx"))
      .withColumn("frame_hash", md5(concat(col("media_id"), lit(":"), col("frame_idx"))))
}
