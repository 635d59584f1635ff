package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched per partition.
  *
  * The actual media codecs are NOT available in this environment, so
  * `decodeStub` produces a deterministic fake feature vector — the Spark
  * side (schema, batching, partitioning, output shape) is real and tested.
  * Swapping in a real decoder means replacing only the marked function.
  */
object Multimodal {

  /** Canonical multimodal schema fragment: payload + metadata columns. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("mime", lit("application/octet-stream"))
      .withColumn("byte_len", octet_length(col("payload")))
      .withColumn("digest", sha2(col("payload"), 256))

  val FeatureDim = 8

  /** STUB — stands in for a real media decoder (image resize, audio
    * frame sampling, …). Deterministic: derives FeatureDim floats from the
    * payload bytes so tests and oracles are stable. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction over a binary column — the
    * Scala analogue of a pandas-UDF `mapInPandas` decode stage: one decoder
    * init per partition, rows streamed through in batches. Output schema:
    * (id, features array<float>). */
  def extractFeatures(df: DataFrame, idCol: String,
                      payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      // per-partition decoder init would go here (real codec handle)
      it.map { row =>
        Row(row.get(idIdx), decodeStub(row.getAs[Array[Byte]](pIdx)))
      }
    }(enc)
  }

  /** Frame-sampling stub for video-like payloads: slice the payload into
    * `n` equally spaced 1-byte "frames" — exercises the 1→N shape
    * (explode) of a real frame sampler. */
  def sampleFrames(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      call_function("substr", payload,
        least(i * floor(octet_length(payload) / n).cast("int") + 1,
          octet_length(payload)), lit(1)))

  /** REAL (non-stub) image header parsing: container format + pixel
    * dimensions from the first bytes of a binary payload — PNG (IHDR),
    * GIF87a/89a (logical screen), and JPEG (SOF0/1/2 scan). Pure byte
    * reading, no codec dependency; returns null for unrecognized payloads.
    * This is the typed-metadata step of an image pipeline (filter by
    * resolution, bucket by aspect ratio) that runs at full scan speed
    * before any expensive decode. */
  def imageDims(p: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G')
      Some(("png", be32(16), be32(20)))
    else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8')
      Some(("gif", le16(6), le16(8)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG segments to the first start-of-frame marker; runs of
      // 0xFF are fill bytes before the marker code (spec-legal padding)
      var i = 2
      while (i < p.length - 1) {
        if (u8(i) != 0xff) return None
        var j = i
        while (j < p.length && u8(j) == 0xff) j += 1
        if (j >= p.length) return None
        val marker = u8(j)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return if (j + 8 <= p.length) Some(("jpeg", be16(j + 6), be16(j + 4)))
                 else None
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i = j + 1
        else {
          if (j + 3 > p.length) return None
          i = j + 1 + be16(j + 1)
        }
      }
      None
    } else None
  }

  /** REAL (non-stub) WAV/RIFF header parsing: (channels, sample rate,
    * bits per sample) from the canonical fmt chunk at fixed offsets —
    * pure little-endian byte reads, no codec dependency; null for
    * non-RIFF payloads. The audio counterpart of [[imageDims]]: the
    * typed-metadata step (filter by sample rate, bucket by channels)
    * that runs at scan speed before any decode. */
  def audioMeta(p: Array[Byte]): Option[(Int, Int, Int)] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 36 &&
        u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E' &&
        u8(12) == 'f' && u8(13) == 'm' && u8(14) == 't' && u8(15) == ' ')
      Some((le16(22), le32(24), le16(34)))
    else None
  }

  /** Batched per-partition image-metadata extraction: (id, format, width,
    * height) with nulls for unrecognized payloads — same mapPartitions
    * batch shape as [[extractFeatures]]. */
  def withImageMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        imageDims(row.getAs[Array[Byte]](pIdx)) match {
          case Some((f, w, h)) => Row(row.get(idIdx), f, w, h)
          case None            => Row(row.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Batched per-partition audio-metadata extraction — the [[audioMeta]]
    * counterpart of [[withImageMeta]]. */
  def withAudioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        audioMeta(row.getAs[Array[Byte]](pIdx)) match {
          case Some((c, r, b)) => Row(row.get(idIdx), c, r, b)
          case None            => Row(row.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }
}
