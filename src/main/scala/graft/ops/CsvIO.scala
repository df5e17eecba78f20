package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pipe-delimited CSV interchange (A5/B4) — the reference's DB-bound file
  * format: `|`-separated, UTF-8, no quoting needed because quotes and
  * commas were removed by the sanitize chain upstream
  * (`/root/reference/adffunction/__init__.py:168` `copy_from(f, tbl,
  * sep='|')`; `SharedCode/HelperFunction.py:36-37`).
  *
  * `readBorrowed` is the staged-load idiom (B4): the reader takes the
  * TARGET's schema, exactly like Postgres' `CREATE TEMP TABLE source
  * (LIKE target INCLUDING ALL)` + COPY (`PGHelperFunction.py:74-75`) —
  * text parses against the target's types, no inference drift.
  *
  * The timestamp format is pinned (second precision, UTC session) so a
  * write→read round-trip is value-stable — golden-tested in `CsvIOSpec`.
  */
object CsvIO {

  val Sep = "|"
  val TsFormat = "yyyy-MM-dd HH:mm:ss"

  def writePipe(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("sep", Sep)
      .option("header", header.toString)
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readPipe(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", Sep)
      .option("header", header.toString)
      .option("timestampFormat", TsFormat)
      .csv(path)

  /** B4: schema borrowed from the target relation (`LIKE target`). */
  def readBorrowed(spark: SparkSession, path: String, target: DataFrame): DataFrame =
    readPipe(spark, path, target.schema)
}
