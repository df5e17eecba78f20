package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so `stubFeatures` derives a deterministic fake feature vector from the
  * md5 of the bytes (clearly marked; a real deployment swaps in a codec
  * behind the same schema/signature). Everything around the stub — the
  * binary+struct schema, batched per-partition processing shape, and
  * slice-based frame sampling — is real Spark plumbing and is tested.
  *
  * Scale notes: binary payloads ride the same parquet scans as everything
  * else; feature extraction is embarrassingly parallel per partition; the
  * metadata struct (not the bytes) is what joins/filters touch, so
  * predicate pushdown keeps payload IO proportional to selectivity.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Pack a string column as a binary payload + metadata struct (the
    * test/fixture path; real media arrives as binary already).
    */
  def packText(df: DataFrame, textCol: String, format: String = "txt"): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit(format).as("format"),
        length(col("content")).cast("long").as("byte_len"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("duration_ms")))

  /** STUB feature extraction — deterministic fake features from content
    * md5: 4 doubles in [0, 1), each from one 8-hex-digit slice. A real
    * implementation replaces this expression with a decoder + model over
    * the same (binary → array<double>) signature.
    */
  def stubFeatures(content: Column): Column = {
    val h = md5(content)
    array((0 until 4).map { i =>
      conv(substring(h, 1 + 8 * i, 8), 16, 10).cast("double") / lit(4294967296.0)
    }: _*)
  }

  /** Frame sampling STUB for video-ish payloads: n evenly-spaced byte
    * slices of `width` bytes (real impl: keyframe extraction). Slicing is
    * real (`substr` on binary); only the interpretation is fake.
    */
  def frameSample(content: Column, n: Int, width: Int): Column = {
    val step = greatest((length(content) / n).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)), i => content.substr(i * step + 1, lit(width)))
  }

  /** Resize STUB for image-ish payloads: scales the byte payload
    * proportionally to the pixel-count change and rebuilds the metadata
    * struct (real impl: decode → scale → re-encode behind the same
    * (content, meta, w, h) → (content, meta) signature). The byte
    * truncation and struct rebuild are real Spark plumbing; only the
    * pixel interpretation is fake.
    */
  def resizeStub(content: Column, meta: Column, w: Int, h: Int): Column = {
    val oldPixels = meta.getField("width").cast("long") * meta.getField("height")
    val newLen = greatest(
      least(length(content).cast("long"),
        // Column./ is true (double) division — cast back to a byte count
        (length(content).cast("long") * (w.toLong * h) / oldPixels).cast("long")),
      lit(1L))
    val resized = struct(
      content.substr(lit(1), newLen.cast("int")).as("content"),
      struct(
        meta.getField("format").as("format"),
        newLen.as("byte_len"),
        lit(w).as("width"),
        lit(h).as("height"),
        meta.getField("duration_ms").as("duration_ms")).as("meta"))
    // Unknown/zero input dimensions: there is no pixel basis to scale by —
    // pass the row through untouched rather than stamping target dims on
    // an unchanged payload (meta must never contradict the bytes).
    when(oldPixels.isNull || oldPixels <= 0,
      struct(content.as("content"), meta.as("meta")))
      .otherwise(resized)
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * path: rows are processed partition-at-a-time through an iterator, the
    * shape a real codec/model batch API needs (vs per-row UDF calls).
    * Output schema: id, features array<double>.
    */
  def extractFeaturesBatched(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col("content")).mapPartitions { it =>
      // Batch shape: pull the partition through one iterator — a real
      // decoder would fill a batch buffer here and run the model per batch.
      // Null-safe: a null id row is unkeyable (dropped); null content
      // yields null features (mirrors the Column-based stubFeatures) —
      // one bad row must not abort the stage.
      it.flatMap { r =>
        if (r.isNullAt(0)) None
        else {
          val feats =
            if (r.isNullAt(1)) null
            else {
              val h = java.security.MessageDigest.getInstance("MD5")
                .digest(r.getAs[Array[Byte]](1))
              (0 until 4).map { i =>
                val u = java.nio.ByteBuffer.wrap(h, 4 * i, 4).getInt.toLong & 0xFFFFFFFFL
                u.toDouble / 4294967296.0
              }.toArray
            }
          Some(Row(r.getLong(0), feats))
        }
      }
    }(enc)
  }
}
