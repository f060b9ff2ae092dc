package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators for training-data pipelines: image/audio/
  * video payloads are opaque `binary` columns travelling beside typed
  * metadata, processed batch-wise inside `mapPartitions` so a decoder
  * drops in without changing the Spark plumbing.
  *
  * Image decode is REAL: [[imageDecode]] uses the JDK's ImageIO
  * (PNG/JPEG/BMP/GIF ship with the JVM — no external codecs needed).
  * Audio/video decode is STUBBED ([[stubDecode]] derives deterministic
  * fake dimensions/features from the bytes) because those codecs
  * genuinely aren't in this container. Schema, partitioning, batch
  * shape, and the UDF signatures — the parts that matter at 100 TB (no
  * shuffle, no driver collect, bounded per-batch memory) — are real and
  * tested either way.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap an id + string column as a media payload (test/ingest helper —
    * real pipelines read binary columns from parquet directly). */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        lit(mime).as("mime"),
        // byte count of the PAYLOAD, not the character count — they
        // differ for non-ASCII text (review finding)
        length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        lit("inline").as("source")).as("meta"))

  /** STUB decode: deterministic pseudo-decode of an image payload into
    * (width, height, channels) + a tiny feature vector. Replace the body
    * with a real codec; the mapPartitions shape stays identical. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    // 8-bin byte histogram as the stand-in feature vector
    val hist = new Array[Float](8)
    var i = 0
    while (i < n) { hist((payload(i) & 0xFF) / 32) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    (w, h, 3, hist)
  }

  /** Real image decode via the JDK's ImageIO: dimensions, color-model
    * channel count, and an 8-bin luminance histogram as the feature
    * vector. Payloads ImageIO cannot read (corrupt bytes, audio/video
    * containers) fall back to [[stubDecode]] so the pipeline never
    * throws mid-partition. */
  def imageDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) return stubDecode(Array.empty)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return stubDecode(payload)
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Float](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        hist(lum / 32) += 1f
        x += 1
      }
      y += 1
    }
    val n = w * h
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    (w, h, img.getColorModel.getNumComponents, hist)
  }

  /** Decode + feature-extract as a narrow mapPartitions stage. The
    * decoder is pluggable; [[imageDecode]] for image payloads,
    * [[stubDecode]] as the codec-free default. */
  def decodeFeatures(media: DataFrame,
      decoder: Array[Byte] => (Int, Int, Int, Array[Float]) = stubDecode): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val pIdx = media.schema.fieldIndex("payload")
    val out = media.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val (w, h, c, f) = decoder(if (payload == null) Array.empty else payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, f.toSeq))
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Resize metadata transform (the codec-free part of a resize op):
    * recompute target dims preserving aspect, tag the op. Pure column
    * expressions — stays in codegen. */
  def planResize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0))
    decoded
      .withColumn("target_width", ceil(col("width") * scale).cast(IntegerType))
      .withColumn("target_height", ceil(col("height") * scale).cast(IntegerType))
  }

  /** REAL image resize: ImageIO decode → Graphics2D bilinear scale
    * preserving aspect ratio (longest side ≤ `maxSide`, never upscaled)
    * → PNG re-encode, all JDK built-ins. Payloads ImageIO cannot read
    * pass through unchanged with `resized = false` — a mixed-modality
    * column never throws mid-partition. Narrow mapPartitions stage:
    * per-row work, no shuffle, bounded memory per batch. */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("resized", BooleanType),
      StructField("out_width", IntegerType), StructField("out_height", IntegerType)))
    val pIdx = media.schema.fieldIndex("payload")
    val out = media.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val img =
          if (payload == null || payload.isEmpty) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(false, -1, -1))
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val (tw, th) = (math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt))
          val target = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = target.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(target, "png", bos)
          val seq = r.toSeq.updated(pIdx, bos.toByteArray: Any)
          Row.fromSeq(seq ++ Seq(true, tw, th))
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Difference hash (dHash, Krawetz 2013) of one payload — the standard
    * perceptual image fingerprint: the image is average-pooled to a 9×8
    * grayscale grid and bit r·8+c is set iff grid(r, c+1) > grid(r, c),
    * so the 64 bits encode the horizontal luminance GRADIENT — stable
    * under re-encode, resize, and small edits, unlike byte digests.
    *
    * Payloads ImageIO cannot read (audio/video containers, raw text)
    * fall back to the same gradient hash over a deterministic BYTE grid:
    * grid cell i (i = r·9+c) reads byte ⌊i·n/72⌋. The fallback is chosen
    * to be reproducible in ANSI SQL over ASCII payloads — one character
    * lookup and one compare per bit — which is what lets the driver
    * oracle-check the whole near-dup pipeline end-to-end (the IMAGE
    * path's parity with it is spec-pinned on real PNGs instead, since no
    * SQL engine decodes PNGs). */
  def dHashBits(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) return 0L
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    val grid = if (img != null) imageGrid(img) else byteGrid(payload)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c + 1) > grid(r * 9 + c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** 9×8 sample grid over raw bytes: cell i = payload[⌊i·n/72⌋] — the
    * SQL-reproducible non-image fallback (`ord(substr(t, i*n//72 + 1, 1))`
    * on ASCII payloads). */
  private def byteGrid(p: Array[Byte]): Array[Int] = {
    val n = p.length.toLong
    Array.tabulate(72)(i => p((i * n / 72).toInt) & 0xFF)
  }

  /** 9×8 average-pooled integer luminance grid (BT.601 integer weights,
    * floor mean — deterministic across JVMs). */
  private def imageGrid(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(72) { i =>
      val r = i / 9
      val c = i % 9
      val x0 = c * w / 9
      val x1 = math.max(x0 + 1, (c + 1) * w / 9)
      val y0 = r * h / 8
      val y1 = math.max(y0 + 1, (r + 1) * h / 8)
      var sum = 0L
      var cnt = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          cnt += 1
          x += 1
        }
        y += 1
      }
      (sum / cnt).toInt
    }
  }

  /** Per-row dHash as a narrow mapPartitions stage: (media_id, dhash). */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val pIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("dhash", LongType)))
    spark.createDataFrame(
      media.rdd.mapPartitions(_.map(r =>
        Row(r.getLong(idIdx), dHashBits(r.getAs[Array[Byte]](pIdx))))),
      schema)
  }

  /** Multimodal near-dup pairs: dHash each payload, then the same
    * pigeonhole segment-blocked hamming join SimHash uses
    * ([[Dedup.hammingPairs64]]) — recall-complete for the radius, one
    * equi-join shuffle, no all-pairs. Returns (id_a, id_b, hamming). */
  def dHashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(
      imageDHash(media).select(col("media_id").as("id"), col("dhash").as("sig")),
      maxHamming)

  /** Frame sampling for video-ish payloads: split the byte stream into
    * `frameBytes` chunks, keep every `stride`-th chunk. Demonstrates the
    * batch-explode shape without a codec. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes $frameBytes must be positive")
    require(stride > 0, s"stride $stride must be positive")
    val spark = media.sparkSession
    val pIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val out = media.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val id = r.getLong(idIdx)
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          // dense 0,1,2,… frame index, not the pre-filter chunk index
          .zipWithIndex
          .map { case ((chunk, _), frameNo) => Row(id, frameNo, chunk) }
      }
    }
    spark.createDataFrame(out, schema)
  }
}
