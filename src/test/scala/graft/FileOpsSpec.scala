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

  test("withRetry: transient IO faults retried with linear backoff, logic errors and exhaustion propagate") {
    // transient fault: fails twice with IOException, then succeeds — a
    // LinearRetry(3) caller sees success and exactly 2 backoff pauses
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = FileOps.withRetry(FileOps.RetryPolicy(3, 250), sleep = slept += _) {
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"flake $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3)
    assert(slept.toSeq == Seq(250L, 250L), "linear: FIXED pause per retry")

    // non-IO failure is NOT transient: one attempt, no sleep
    var logicCalls = 0
    intercept[IllegalArgumentException] {
      FileOps.withRetry(FileOps.RetryPolicy(3, 250), sleep = _ => fail("must not sleep")) {
        logicCalls += 1
        throw new IllegalArgumentException("bug")
      }
    }
    assert(logicCalls == 1)

    // exhaustion: the LAST failure propagates, never silence
    var persistCalls = 0
    val e = intercept[java.io.IOException] {
      FileOps.withRetry(FileOps.RetryPolicy(3, 0)) {
        persistCalls += 1
        throw new java.io.IOException(s"down $persistCalls")
      }
    }
    assert(persistCalls == 3 && e.getMessage == "down 3")
  }

  test("archiveMove under retry survives a source that appears between attempts") {
    // fault injection through the sleep hook is not available on
    // archiveMove's own signature — the injected fault here is a MISSING
    // SOURCE healed by a concurrent writer mid-backoff, the exact shape
    // of the reference's eventually-consistent blob listing. NoRetry must
    // fail; LinearRetry-with-healing must succeed.
    val root = tmpDir("fileops_retry")
    val dir = new File(root, "inbox"); dir.mkdirs()
    val missing = new File(dir, "late.xlsx").getAbsolutePath
    val ts = LocalDateTime.of(2024, 6, 1, 12, 0)
    intercept[java.io.IOException] {
      FileOps.archiveMove(spark, missing, s"$root/archive", ts)
    }
    // heal on a timer thread shorter than the (real) backoff
    val t = new Thread(() => { Thread.sleep(200); touch(dir.getAbsolutePath, "late.xlsx"); () })
    t.start()
    val dest = FileOps.archiveMove(spark, missing, s"$root/archive", ts,
      retry = FileOps.RetryPolicy(attempts = 10, backoffMs = 300))
    t.join()
    assert(new File(dest).exists(), "healed source must archive")
    assert(!new File(missing).exists())
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
