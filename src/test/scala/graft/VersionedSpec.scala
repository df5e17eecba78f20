package graft

import graft.ops.Versioned
import org.apache.spark.sql.functions._

/** Versioned-table laws: snapshot immutability under append/overwrite,
  * time travel, metadata-only rollback, vacuum retention semantics, and
  * crash-orphan cleanup.
  */
class VersionedSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("append and overwrite snapshots; every version stays readable as written") {
    val t = tmpDir("versioned") + "/t"
    val v1 = Versioned.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v2 = Versioned.commit(spark, t, Seq((3L, "c")).toDF("id", "s"))
    val v3 = Versioned.commit(spark, t, Seq((9L, "z")).toDF("id", "s"),
      overwrite = true)
    assert((v1, v2, v3) == ((1L, 2L, 3L)))
    assert(rows(Versioned.read(spark, t, Some(1))) == Set((1L, "a"), (2L, "b")))
    assert(rows(Versioned.read(spark, t, Some(2))) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "append must include the parent snapshot")
    assert(rows(Versioned.read(spark, t, Some(3))) == Set((9L, "z")),
      "overwrite must reference only its own data")
    assert(rows(Versioned.read(spark, t)) == Set((9L, "z")), "default = latest")
  }

  test("rollback is metadata-only and restores the target snapshot") {
    val t = tmpDir("versioned-rb") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    val dataDirs = new java.io.File(s"$t/data").list().toSet
    val v3 = Versioned.rollback(spark, t, 1L)
    assert(v3 == 3L)
    assert(rows(Versioned.read(spark, t)) == Set((1L, "a")))
    assert(new java.io.File(s"$t/data").list().toSet == dataDirs,
      "rollback must write NO data dirs")
    // history after the rollback is intact
    assert(rows(Versioned.read(spark, t, Some(2))) == Set((1L, "a"), (2L, "b")))
  }

  test("vacuum deletes only unreferenced dirs; latest survives, stale time travel fails loudly") {
    val t = tmpDir("versioned-vac") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((9L, "z")).toDF("id", "s"), overwrite = true)
    // an orphan from a "crashed writer": data dir without a manifest
    Seq((7L, "orphan")).toDF("id", "s").write.parquet(s"$t/data/v000099")
    val deleted = Versioned.vacuum(spark, t)
    assert(deleted == Seq("v000001", "v000099"),
      s"vacuum must remove the unreferenced dir AND the orphan, got $deleted")
    assert(rows(Versioned.read(spark, t)) == Set((9L, "z")))
    val e = intercept[IllegalArgumentException](Versioned.read(spark, t, Some(1)))
    assert(e.getMessage.contains("vacuumed"),
      "reading past retention must fail with the vacuum message, not a scan error")
  }

  test("purge erases from the snapshot at once, from DISK only after vacuum") {
    val t = tmpDir("versioned-purge") + "/t"
    Versioned.commit(spark, t, Seq((1L, "keep"), (666L, "secret")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "also")).toDF("id", "s"))
    val v = Versioned.purge(spark, t, $"id" === 666L)
    assert(v == 3L)
    assert(rows(Versioned.read(spark, t)) == Set((1L, "keep"), (2L, "also")))
    // the subtle half of the contract: HISTORY still holds the bytes —
    // a purge without vacuum is not an erasure
    assert(rows(Versioned.read(spark, t, Some(1))).contains((666L, "secret")))
    def onDisk: Boolean = spark.read.parquet(s"$t/data/*")
      .filter($"id" === 666L).count() > 0
    assert(onDisk, "bytes must still be on disk before vacuum")
    Versioned.vacuum(spark, t)
    assert(!onDisk, "vacuum must remove the purged bytes from every surviving dir")
    assert(rows(Versioned.read(spark, t)) == Set((1L, "keep"), (2L, "also")))
  }

  test("compact folds an append chain into one dir, invisibly to readers") {
    val t = tmpDir("versioned-compact") + "/t"
    (1 to 4).foreach(i =>
      Versioned.commit(spark, t, Seq((i.toLong, s"r$i")).toDF("id", "s")))
    val before = rows(Versioned.read(spark, t))
    val v = Versioned.compact(spark, t, numFiles = 2)
    assert(v == 5L)
    assert(rows(Versioned.read(spark, t)) == before, "compact must not change content")
    // latest snapshot references exactly ONE data dir with <= numFiles files
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$t/_commits/000005.manifest"))
    val refs = manifest.linesIterator.toSeq.tail.filter(_.nonEmpty)
    assert(refs == Seq("v000005"), s"compacted snapshot must reference one dir: $refs")
    val parts = new java.io.File(s"$t/data/v000005").list()
      .count(_.endsWith(".parquet"))
    assert(parts <= 2, s"expected <= 2 files after compact, got $parts")
    // history pre-compact still reads; vacuum then reclaims the chain
    assert(rows(Versioned.read(spark, t, Some(4))) == before)
    val deleted = Versioned.vacuum(spark, t)
    assert(deleted == Seq("v000001", "v000002", "v000003", "v000004"))
    assert(rows(Versioned.read(spark, t)) == before)
  }

  test("a second writer targeting the same version cannot silently clobber data") {
    val t = tmpDir("versioned-cas") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // both writers computed next version = 2; the slower one must fail on
    // the immutable data dir instead of overwriting the winner's files
    Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    intercept[Exception] {
      Seq((666L, "evil")).toDF("id", "s")
        .write.mode("errorifexists").parquet(s"$t/data/v000002")
    }
    assert(rows(Versioned.read(spark, t, Some(2))) == Set((1L, "a"), (2L, "b")))
  }
}
