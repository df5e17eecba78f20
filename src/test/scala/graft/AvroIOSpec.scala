package graft

import graft.sources.AvroIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro interchange laws: every bridged type survives the round trip
  * value-exact (including NULLs through the union branch), the embedded
  * writer schema reads back as the original Spark schema, and files are
  * genuine Avro object container files (magic bytes).
  */
class AvroIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("nts", TimestampNTZType),
    StructField("dec", DecimalType(12, 3))))

  private def sampleRows: Seq[Row] = Seq(
    Row(1L, 2, 3.5d, 4.25f, true, "hello",
      Array[Byte](1, 2, 3), java.sql.Date.valueOf("2021-06-01"),
      java.sql.Timestamp.valueOf("2021-06-01 12:34:56.789012"),
      java.time.LocalDateTime.parse("2021-06-01T12:34:56.789012"),
      new java.math.BigDecimal("12345.678")),
    // every field NULL: the union(null, T) branch both ways
    Row(null, null, null, null, null, null, null, null, null, null, null),
    Row(-9L, -8, -7.5d, -6.5f, false, "wörld ☃",
      Array[Byte](), java.sql.Date.valueOf("1969-12-31"),
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001"),
      java.time.LocalDateTime.parse("1969-12-31T23:59:59.000001"),
      new java.math.BigDecimal("-0.001")))

  test("every bridged type round-trips value-exact, NULLs included") {
    val dir = tmpDir("avroio") + "/t"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 2), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema,
      s"schema must survive the embedded-header inference: ${back.schema}")
    def key(r: Row): String = r.toSeq.map {
      case a: Array[Byte] => a.toSeq.toString
      case x => String.valueOf(x)
    }.mkString("|")
    assert(back.collect().map(key).sorted.toSeq ==
      sampleRows.map(key).sorted,
      "round-tripped rows must be value-identical")
  }

  test("container files carry the Avro magic and one file lands per partition") {
    val dir = tmpDir("avroio-magic") + "/t"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 3), schema)
    AvroIO.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, s"one container file per partition, got ${files.length}")
    files.foreach { f =>
      val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
      assert(head.sameElements("Obj".getBytes("UTF-8") :+ 1.toByte),
        s"${f.getName} must start with the Avro container magic Obj\\x01")
    }
  }

  test("unsupported types and non-record schemas refuse loudly") {
    val dir = tmpDir("avroio-bad") + "/t"
    import spark.implicits._
    val arrDf = Seq((1L, Seq("a", "b"))).toDF("id", "tags")
    val e = intercept[IllegalArgumentException](AvroIO.write(arrDf, dir))
    assert(e.getMessage.contains("unsupported Spark type"))
    intercept[IllegalArgumentException](AvroIO.read(spark, tmpDir("avroio-empty")))
  }
}
