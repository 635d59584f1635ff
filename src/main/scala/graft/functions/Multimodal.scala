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
}
