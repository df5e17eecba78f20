package graft

import graft.ops.Upsert

/** Upsert algebra laws (SURVEY §5: idempotence, key-set union, source
  * wins, deterministic source-dedup, key validation) + the atomic-swap
  * write path.
  */
class UpsertSpec extends SparkSpec {

  private def target = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
  }

  private def source = {
    import spark.implicits._
    // key 2 updated, key 4 inserted, key 5 duplicated (dedup must keep the
    // smallest row under (s, v) ordering: ("x", 1.0)).
    Seq((2L, "B", 200.0), (4L, "d", 40.0), (5L, "y", 2.0), (5L, "x", 1.0)).toDF("k", "s", "v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("merge: source wins on matched keys, inserts new keys, keeps unmatched target") {
    val out = rows(Upsert.merge(target, source, Seq("k")))
    assert(out == Set(
      (1L, "a", 10.0), (3L, "c", 30.0),      // untouched target
      (2L, "B", 200.0),                      // updated
      (4L, "d", 40.0), (5L, "x", 1.0)))      // inserted (5 deduped deterministically)
  }

  test("merge is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    val once = Upsert.merge(target, source, Seq("k"))
    val twice = Upsert.merge(once, source, Seq("k"))
    assert(rows(once) == rows(twice))
  }

  test("merge key-set is union of target and source key-sets") {
    val out = Upsert.merge(target, source, Seq("k"))
    import spark.implicits._
    val keys = out.select($"k").collect().map(_.getLong(0)).sorted.toSeq
    assert(keys == Seq(1L, 2L, 3L, 4L, 5L), "every key exactly once")
  }

  test("empty keys and missing key columns raise the reference's key error") {
    intercept[Upsert.KeyError](Upsert.merge(target, source, Seq.empty))
    intercept[Upsert.KeyError](Upsert.merge(target, source, Seq("nope")))
  }

  test("dedupByKey picks the deterministic smallest representative") {
    import spark.implicits._
    val src = Seq((1L, "b", 2.0), (1L, "a", 9.0), (1L, "a", 3.0)).toDF("k", "s", "v")
    val rep = rows(Upsert.dedupByKey(src, Seq("k")))
    assert(rep == Set((1L, "a", 3.0)), "ordered by (s asc, v asc)")
  }

  test("run(): atomic swap leaves the merged table and no staging debris") {
    val dir = tmpDir("upsert") + "/table"
    target.write.parquet(dir)
    Upsert.run(spark, dir, source, Seq("k"))
    assert(rows(spark.read.parquet(dir)) == rows(Upsert.merge(target, source, Seq("k"))))
    val parent = new java.io.File(dir).getParentFile
    val leftovers = parent.list().toSeq.filter(n => n.contains("_staging") || n.contains("_old"))
    assert(leftovers.isEmpty, s"staging debris: $leftovers")
  }

  test("run() recovers a table stranded at ._old by a crash in the rename window") {
    val dir = tmpDir("upsert_recover") + "/table"
    target.write.parquet(dir)
    // Simulate the crash: old staged out, staging never swapped in.
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "._old")))
    Upsert.run(spark, dir, source, Seq("k"))
    assert(rows(spark.read.parquet(dir)) == rows(Upsert.merge(target, source, Seq("k"))))
  }

  test("append keeps duplicate keys (A11 raw COPY semantics)") {
    val dir = tmpDir("append") + "/table"
    target.write.parquet(dir)
    Upsert.append(source, dir)
    assert(spark.read.parquet(dir).count() == target.count() + source.count())
  }
}
