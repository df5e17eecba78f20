package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C1 scan formats beyond parquet/CSV/Excel: JSON (schema'd and inferred)
  * and text round-trips through the engine's session.
  */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  test("json: explicit-schema read round-trips values and nulls") {
    val dir = tmpDir("src_json")
    Seq((1L, "a", 1.5), (2L, null, 2.5), (3L, "c", -0.25))
      .toDF("id", "s", "v").write.mode("overwrite").json(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.schema === schema)
    assert(back.orderBy($"id").collect().map(r => (r.getLong(0), r.isNullAt(1), r.getDouble(2))).toSeq
      === Seq((1L, false, 1.5), (2L, true, 2.5), (3L, false, -0.25)))
  }

  test("text: line source reads what a line sink wrote, filters push to the scan") {
    val dir = tmpDir("src_text")
    Seq("alpha", "beta", "gamma beta").toDF("value").write.mode("overwrite").text(dir)
    val lines = spark.read.text(dir)
    assert(lines.count() === 3)
    assert(lines.filter($"value".contains("beta")).count() === 2)
  }
}
