package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extraction running
  * batched per partition (the Scala analogue of `mapInPandas` — one
  * executor-side loop over an iterator of rows, amortizing per-partition
  * codec setup).
  *
  * The IMAGE path is a real codec: payloads are actual PNG bytes and
  * [[decodeImage]] runs them through `javax.imageio` (public JDK API),
  * emitting decoded dimensions, channel count, and per-channel pixel
  * means. Because the synthetic fixture's PNGs are solid-fill images
  * whose dimensions and color are analytic functions of the document row
  * ([[syntheticPng]]), every decoded feature is recomputable by a SQL
  * oracle — the decode is content-checked end to end. Audio/video
  * payloads keep the deterministic byte-histogram stub ([[decodeStub]]):
  * this container ships no audio/video codec libraries, and the stub has
  * the exact signature a real one would (bytes → fixed-shape floats).
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

  /** Synthetic-image parameterization: dimensions and fill color are pure
    * functions of (id, nChars), so a SQL oracle can predict what a correct
    * PNG decode must return. PNG is lossless — the decoded pixel means
    * equal the fill color exactly.
    */
  def imageWidth(id: Long): Int = 16 + (id % 48).toInt
  def imageHeight(nChars: Long): Int = 16 + (nChars % 32).toInt
  def imageRgb(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)

  /** Deterministic real PNG: a solid-fill RGB image encoded with
    * `javax.imageio`. Used by the fixture builder; any PNG from any
    * source decodes through the same [[decodeImage]] path.
    */
  def syntheticPng(id: Long, nChars: Long): Array[Byte] = {
    val (w, h) = (imageWidth(id), imageHeight(nChars))
    val (r, g, b) = imageRgb(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, "png", bos))
      sys.error("no PNG writer available in this JRE")
    bos.toByteArray
  }

  /** Decoded-image summary: true dimensions, channel count, and the mean
    * of each RGB channel over all pixels.
    */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                means: Array[Float])

  /** REAL image decode via `javax.imageio`: parses the container format
    * (PNG/JPEG/BMP/GIF — whatever the JRE's readers cover), walks the
    * pixels through the color model, and reduces to per-channel means.
    * Loud failure on undecodable bytes — silently emitting zeros would
    * poison downstream features.
    */
  def decodeImage(bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      sys.error(s"decodeImage: undecodable image payload (${bytes.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    val channels = img.getRaster.getNumBands
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // color-model-correct ARGB
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    DecodedImage(w, h, channels,
      Array((sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat, (sb.toDouble / n).toFloat))
  }

  /** STUB decoder for the codec-less kinds (audio/video): a 16-bin
    * histogram of byte values mod 16, normalized — deterministic,
    * fixed-shape, same signature a real decoder would have.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xff) % 16) += 1f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < 16) { bins(j) /= bytes.length; j += 1 } }
    bins
  }

  private val pngUdf = udf { (id: Long, nChars: Long) => syntheticPng(id, nChars) }

  /** Deterministic media table derived from the documents fixture: image
    * rows carry REAL PNG payloads ([[syntheticPng]]); audio/video rows
    * carry the utf-8 text bytes (stand-in payloads for the stubbed
    * codecs). Metadata width/height mirror the true image dimensions —
    * the "prune on metadata, never touch bytes" columns.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      when(col("doc_id") % 3 === 0, pngUdf(col("doc_id"), col("n_chars")))
        .otherwise(encode(col("text"), "UTF-8")).as("bytes"),
      when(col("doc_id") % 3 === 0, lit(16) + (col("doc_id") % 48).cast("int"))
        .otherwise((col("n_chars") % 640).cast("int")).as("width"),
      when(col("doc_id") % 3 === 0, lit(16) + (col("n_chars") % 32).cast("int"))
        .otherwise((col("n_chars") % 480).cast("int")).as("height"))

  /** Batched feature extraction over the media table: one partition-level
    * iterator pass (per-partition setup — codec/model load — paid once,
    * not per row). Image rows go through the real `javax.imageio` decode;
    * other kinds through the stub. Output drops the payload and adds:
    * decoded_width / decoded_height / channels (null for stub kinds) and
    * `features: array<float>` (3 channel means for images, 16 histogram
    * bins for stub kinds).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "bytes") ++ Seq(
      StructField("decoded_width", IntegerType, nullable = true),
      StructField("decoded_height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition setup happens HERE (ImageIO readers are looked up
      // per call; a heavier codec/model would be initialized once here)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val kind = r.getAs[String]("kind")
        val head = Seq(r.getAs[Long]("media_id"), kind,
          r.getAs[Int]("width"), r.getAs[Int]("height"))
        val tail: Seq[Any] =
          if (kind == "image") {
            val d = decodeImage(bytes)
            Seq(d.width, d.height, d.channels, d.means.toSeq)
          } else Seq(null, null, null, decodeStub(bytes).toSeq)
        Row.fromSeq(head ++ tail)
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
