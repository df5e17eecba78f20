package graft

import java.io.File
import java.time.LocalDateTime

import graft.ops.FileOps
import org.apache.spark.sql.functions.col

/** Filesystem operators (A6/A7/A8/A12): listing filters, archive move with
  * timestamp rename, guarded prefix delete, work-dir reset.
  */
class FileOpsSpec extends SparkSpec {

  private def touch(dir: String, name: String): String = {
    val f = new File(dir, name)
    java.nio.file.Files.write(f.toPath, "x".getBytes)
    f.getAbsolutePath
  }

  test("listFiles + excelInputFilter: skips placeholder, keeps .xls* case-insensitively") {
    val dir = tmpDir("fileops_list")
    Seq("placeholder.txt", "a.xlsx", "b.XLSM", "c.csv", "d.xls").foreach(touch(dir, _))
    val kept = FileOps.listFiles(spark, dir)
      .filter(FileOps.excelInputFilter(col("name")))
      .select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(kept === Seq("a.xlsx", "b.XLSM", "d.xls"))
  }

  test("archiveMove: <root>/<dir-name>/_<yyyyMMddHHmm>/<file>, source removed") {
    val dir = tmpDir("fileops_archive") + "/db-input"
    new File(dir).mkdirs()
    val src = touch(dir, "book.xlsx")
    val root = tmpDir("fileops_archive_root")
    val dest = FileOps.archiveMove(spark, src, root, LocalDateTime.of(2024, 1, 2, 3, 4))
    assert(dest.endsWith("db-input/_202401020304/book.xlsx"))
    assert(!new File(src).exists())
    assert(new File(dest.stripPrefix("file:")).exists())
  }

  test("deletePrefix refuses near-root paths and deletes real prefixes") {
    intercept[IllegalArgumentException](FileOps.deletePrefix(spark, "/tmp"))
    val dir = tmpDir("fileops_delete") + "/sub"
    new File(dir).mkdirs()
    touch(dir, "f.txt")
    assert(FileOps.deletePrefix(spark, dir))
    assert(!new File(dir).exists())
  }

  test("resetWorkDirs leaves empty existing dirs") {
    val dir = tmpDir("fileops_reset") + "/work"
    new File(dir).mkdirs()
    touch(dir, "junk.txt")
    FileOps.resetWorkDirs(spark, Seq(dir))
    assert(new File(dir).exists() && new File(dir).list().isEmpty)
  }
}
