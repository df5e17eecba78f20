package graft.sources

import java.io.ByteArrayInputStream
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** AVRO interchange — the one mainstream format the scan row was
  * missing (parquet/CSV/JSON/text/ORC/XML/Excel/fixed-width all have
  * oracle-checked round-trips). `/opt/spark/jars` carries the Avro
  * LIBRARY but not the `spark-avro` data source, so this is the
  * XlsSource precedent applied one level up: real Avro OBJECT CONTAINER
  * FILES (header, schema JSON, sync-marked deflate-able blocks — what
  * Kafka archives and Sqoop exports actually hold), written and read
  * through `org.apache.avro`'s own codec, with the Spark side as
  * distributed plumbing.
  *
  * Type bridge (both directions, nullable = `union(null, T)`):
  * long/int/double/float/boolean/string/binary map directly; DATE is
  * the `date` logical type over int epoch-days; TIMESTAMP is
  * `timestamp-micros` over long (epoch-based on both sides, so the
  * session timezone cannot shift values); DECIMAL is the `decimal`
  * logical type over bytes (two's-complement unscaled value).
  *
  * 100 TB shape: one container file per input partition on write (the
  * writer never collects), per-FILE read parallelism on read (the
  * `binaryFile` relation distributes files across tasks; decode is a
  * per-partition stream). Container blocks are sync-marker-splittable
  * in principle — per-file granularity is the honest scope here, the
  * same contract as the XML/Excel readers: size write partitions to
  * size read tasks.
  */
object AvroIO {

  /** Spark schema → Avro record schema. Every field is nullable in the
    * Avro sense (`union(null, T)`) when Spark says it is.
    */
  def avroSchemaOf(st: StructType, name: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case d: DecimalType =>
          LogicalTypes.decimal(d.precision, d.scale)
            .addToSchema(Schema.create(Schema.Type.BYTES))
        case other => throw new IllegalArgumentException(
          s"unsupported Spark type for Avro interchange: ${other.simpleString} (${f.name})")
      }
      val typ = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, typ, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Avro schema (record) → Spark schema. Unions of (null, T) read as
    * nullable T; logical date/timestamp-micros/decimal map back to
    * DATE/TIMESTAMP/DECIMAL.
    */
  def sparkSchemaOf(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"expected a record schema, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (branch, nullable) = nonNull(f.schema())
      StructField(f.name(), sparkTypeOf(branch), nullable)
    })
  }

  private def nonNull(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala
      val nn = branches.filter(_.getType != Schema.Type.NULL)
      require(nn.length == 1,
        s"only union(null, T) is supported, got ${s.toString(false)}")
      (nn.head, branches.length != nn.length)
    }

  private def sparkTypeOf(s: Schema): DataType = (s.getType, s.getLogicalType) match {
    case (Schema.Type.INT, _: LogicalTypes.Date) => DateType
    case (Schema.Type.LONG, _: LogicalTypes.TimestampMicros) => TimestampType
    case (Schema.Type.LONG, _: LogicalTypes.LocalTimestampMicros) => TimestampNTZType
    case (Schema.Type.BYTES, d: LogicalTypes.Decimal) =>
      DecimalType(d.getPrecision, d.getScale)
    case (Schema.Type.LONG, _) => LongType
    case (Schema.Type.INT, _) => IntegerType
    case (Schema.Type.DOUBLE, _) => DoubleType
    case (Schema.Type.FLOAT, _) => FloatType
    case (Schema.Type.BOOLEAN, _) => BooleanType
    case (Schema.Type.STRING, _) => StringType
    case (Schema.Type.BYTES, _) => BinaryType
    case (t, _) => throw new IllegalArgumentException(
      s"unsupported Avro type for Spark interchange: $t")
  }

  /** Write `df` as Avro container files under `dir`, one file per
    * partition (`part-%05d.avro`). Executors build their FileSystem from
    * the DRIVER's Hadoop configuration (broadcast — a fresh
    * `Configuration()` would drop session filesystem settings such as
    * object-store credentials/endpoints; ADVICE r11 low), and each task
    * ATTEMPT stages to an attempt-unique temp name published by an
    * overwrite-rename — speculative/retried attempts write identical
    * bytes to distinct temps and the last atomic rename wins, so
    * concurrent attempts can never interleave one part file.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val avroJson = avroSchemaOf(st).toString
    val dirPath = new Path(dir)
    val sc = df.sparkSession.sparkContext
    val fsDriver = dirPath.getFileSystem(sc.hadoopConfiguration)
    fsDriver.mkdirs(dirPath)
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    val n = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val conf = confBc.value.value
      val out = new Path(f"$dir/part-$pid%05d.avro")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new Path(f"$dir/.part-$pid%05d-$attempt.avro.tmp")
      val fs = out.getFileSystem(conf)
      val stream = fs.create(tmp, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, stream)
      var count = 0L
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.fields.length) {
            rec.put(i, toAvro(row, i, st.fields(i).dataType))
            i += 1
          }
          writer.append(rec)
          count += 1
        }
      } finally writer.close() // closes the underlying stream too
      // atomic publish: replace any previous attempt's part file in one
      // step (FileContext rename OVERWRITE — plain FileSystem.rename
      // refuses an existing destination)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(out.toUri, conf)
      fc.rename(tmp, out, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      Iterator.single(count)
    }.sum()
    n: Unit
  }

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => java.lang.Long.valueOf(row.getLong(i))
      case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getString(i)
      case BinaryType => ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      case DateType =>
        java.lang.Integer.valueOf(row.getDate(i).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val t = row.getTimestamp(i)
        java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
      case TimestampNTZType =>
        val ldt = row.getAs[java.time.LocalDateTime](i)
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L)
      case d: DecimalType =>
        val bd = row.getDecimal(i).setScale(d.scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case other => throw new IllegalArgumentException(
        s"unsupported type: ${other.simpleString}")
    }

  /** Read the Avro container files under `dir` back as a DataFrame.
    * Schema comes from the FIRST file's embedded writer schema (one
    * driver-side header read); decoding is distributed per file via the
    * `binaryFile` relation.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dirPath).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro files under $dir")
    val headerIn = fs.open(files.head)
    val avroSchema = try {
      val s = new DataFileStream[GenericRecord](headerIn,
        new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    } finally ()
    val st = sparkSchemaOf(avroSchema)
    val avroJson = avroSchema.toString
    import org.apache.spark.sql.functions.col
    val bin = spark.read.format("binaryFile")
      .load(files.map(_.toString): _*)
      .select(col("content")).as(Encoders.BINARY)
    bin.mapPartitions { contents =>
      contents.flatMap { bytes =>
        val schema = new Schema.Parser().parse(avroJson)
        val stream = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(bytes),
          new GenericDatumReader[GenericRecord](schema))
        val rows = stream.iterator().asScala.map { rec =>
          Row.fromSeq(st.fields.indices.map(i =>
            fromAvro(rec.get(i), st.fields(i).dataType)))
        }
        // DataFileStream over a byte array needs no explicit close; the
        // iterator is fully drained by the flatMap
        rows
      }
    }(Encoders.row(st))
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 → String
      case BinaryType =>
        val b = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case DateType =>
        java.sql.Date.valueOf(LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.sql.Timestamp.from(Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case TimestampNTZType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case d: DecimalType =>
        val b = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
        new JBigDecimal(new BigInteger(arr), d.scale)
      case _ => v // long/int/double/float/boolean pass through boxed
    }
}
