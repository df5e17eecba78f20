package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the Excel sources — the idiomatic Spark
  * packaging of [[ExcelSource]]/[[XlsSource]] (SURVEY §2 A1's declared
  * mapping):
  *
  * {{{
  *   spark.read.format("graft-excel")
  *     .option("sheets", "data,extra")   // default "all" (A2)
  *     .load("/path/to/folder")          // *.xlsx and *.xls side by side
  * }}}
  *
  * Fixed schema (`file`, `sheet`, `row_idx`, `cells`). One input partition
  * per workbook file — a workbook is the natural unit of work (the format
  * caps out far below partition size), so a folder of thousands of
  * workbooks parallelizes per-file exactly like the `binaryFile` path,
  * but through the engine-native connector API: the driver plans file
  * splits, executors open their own file via the Hadoop FS (no byte
  * shipping through a DataFrame), and Spark handles task retry per file.
  */
final class ExcelTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-excel"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExcelSource.Schema

  // Lets a user restate the fixed schema explicitly (skipping inference);
  // getTable then rejects anything that isn't exactly that schema.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 convention for fixed-schema sources: a user-supplied schema
    // that differs from ours would make the analyzer expect rows this
    // reader never produces — reject it loudly instead.
    if (schema != ExcelSource.Schema)
      throw new IllegalArgumentException(
        s"graft-excel has a fixed schema ${ExcelSource.Schema.simpleString}; " +
          s"a user-specified schema (got ${schema.simpleString}) is not supported")
    new ExcelTable(new CaseInsensitiveStringMap(properties))
  }
}

private final class ExcelTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-excel(${options.getOrDefault("path", "")})"
  override def schema(): StructType = ExcelSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ExcelScanBuilder(opts)
}

private final class ExcelScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ExcelSource.Schema
  override def toBatch: Batch = this
  override def description(): String = "graft-excel scan"

  private def sheets: String = options.getOrDefault("sheets", "all")

  override def planInputPartitions(): Array[InputPartition] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-excel requires a load(path)"))
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resolved = ExcelSource.resolveInputFiles(fs, p)
    if (resolved.isEmpty && !fs.exists(p))
      throw new IllegalArgumentException(s"graft-excel path does not exist: $path")
    val files = resolved.collect {
      case st if { val n = st.getPath.getName.toLowerCase
                   n.endsWith(".xlsx") || n.endsWith(".xls") } =>
        (st.getPath.toString, st.getLen)
    }
    // deterministic plan order; size recorded for future split heuristics
    files.sortBy(_._1).map { case (f, _) =>
      ExcelFilePartition(f, sheets): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ExcelPartitionReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private final case class ExcelFilePartition(file: String, sheets: String)
    extends InputPartition

private final class ExcelPartitionReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ExcelFilePartition]
    new PartitionReader[InternalRow] {
      private val rows: Iterator[(String, Int, Seq[String])] = {
        val p = new Path(part.file)
        val fs = p.getFileSystem(conf.value)
        // size guard BEFORE materializing: a pathological workbook fails
        // with the limit named, not as an executor OOM (whole-container
        // reads are inherent to zip/OLE2 central-directory formats)
        ExcelSource.guardSize(part.file, fs.getFileStatus(p).getLen)
        val in = fs.open(p)
        val bytes =
          try in.readAllBytes()
          finally in.close()
        val parsed =
          if (part.file.toLowerCase.endsWith(".xls"))
            XlsSource.parseWorkbook(bytes, part.sheets)
          else ExcelSource.parseWorkbook(bytes, part.sheets)
        parsed.iterator
      }
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!rows.hasNext) false
        else {
          val (sheet, idx, cells) = rows.next()
          current = InternalRow(
            UTF8String.fromString(part.file),
            UTF8String.fromString(sheet),
            idx,
            ArrayData.toArrayData(cells.map(UTF8String.fromString).toArray))
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
