package graft

import org.apache.spark.sql.sources._

import graft.ops.{Layout, Versioned}
import graft.ops.Versioned.ScanPredicate
import graft.sources.VersionedRelation

/** The Catalyst-integrated versioned-table surface: the `graft-table`
  * relation (pushed filters → manifest file skipping), the DataFrame
  * writer path, SQL resolution (`FROM graft.`path``), SQL time travel
  * (VERSION / TIMESTAMP AS OF), and SQL INSERT INTO.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def seedSorted(t: String, n: Int = 200, files: Int = 8): Unit = {
    val df = (1 to n).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    Versioned.commitWithStats(spark,
      t, Layout.sortedByRange(df, Seq($"id"), files), Seq("id"))
  }

  test("relation: pushed range filter prunes files, result matches a plain read") {
    val t = tmpDir("gtable-prune") + "/t"
    seedSorted(t)
    val df = spark.read.format("graft-table").load(t)
      .filter($"id" >= 50L && $"id" <= 80L)
    val got = rows(df)
    assert(got == (50 to 80).map(i => (i.toLong, s"s$i")).toSet)
    val info = VersionedRelation.lastScan(t).get
    assert(info.kept > 0 && info.kept < info.total,
      s"pushed filter must reach the file planner: $info")
    assert(info.prunedColumns == Seq("id"))
  }

  test("relation: filter on a stats-less column scans everything but stays correct") {
    val t = tmpDir("gtable-nostats") + "/t"
    seedSorted(t)
    val df = spark.read.format("graft-table").load(t).filter($"s" === "s7")
    assert(rows(df) == Set((7L, "s7")))
    val info = VersionedRelation.lastScan(t).get
    // `s` has no stats rows → decision coalesces keep=true (conservative)
    assert(info.kept == info.total, s"stats-less column must not prune: $info")
  }

  test("relation: dv-deleted rows stay deleted through the pruned scan") {
    val t = tmpDir("gtable-dv") + "/t"
    seedSorted(t)
    Versioned.deleteWhere(spark, t, $"id" === 60L)
    val df = spark.read.format("graft-table").load(t)
      .filter($"id".between(55L, 65L))
    assert(rows(df) == (55 to 65).filter(_ != 60).map(i => (i.toLong, s"s$i")).toSet)
  }

  test("relation: versionAsOf/timestampAsOf options time-travel; both together refuse") {
    val t = tmpDir("gtable-tt") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    assert(rows(spark.read.format("graft-table")
      .option("versionAsOf", 1).load(t)) == Set((1L, "a")))
    val ts1 = Versioned.readManifest(spark, t, 1L).ts.get
    assert(rows(spark.read.format("graft-table")
      .option("timestampAsOf", ts1).load(t)) == Set((1L, "a")))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("versionAsOf", 1)
        .option("timestampAsOf", ts1).load(t)
    }
  }

  test("writer: save modes map onto commit verbs (append rebases, overwrite replaces)") {
    val t = tmpDir("gtable-write") + "/t"
    Seq((1L, "a")).toDF("id", "s").write.format("graft-table")
      .mode("append").save(t)
    Seq((2L, "b")).toDF("id", "s").write.format("graft-table")
      .mode("append").save(t)
    assert(rows(spark.read.format("graft-table").load(t)) ==
      Set((1L, "a"), (2L, "b")))
    Seq((9L, "z")).toDF("id", "s").write.format("graft-table")
      .mode("overwrite").save(t)
    assert(rows(spark.read.format("graft-table").load(t)) == Set((9L, "z")))
    intercept[IllegalStateException] {
      Seq((3L, "c")).toDF("id", "s").write.format("graft-table")
        .mode("errorifexists").save(t)
    }
    Seq((3L, "c")).toDF("id", "s").write.format("graft-table")
      .mode("ignore").save(t) // table exists → no-op
    assert(rows(spark.read.format("graft-table").load(t)) == Set((9L, "z")))
  }

  test("SQL: FROM graft.`path` resolves, WHERE pushes into file skipping") {
    val t = tmpDir("gtable-sql") + "/t"
    seedSorted(t)
    val got = spark.sql(
      s"SELECT id, s FROM graft.`$t` WHERE id BETWEEN 10 AND 20")
    assert(rows(got) == (10 to 20).map(i => (i.toLong, s"s$i")).toSet)
    val info = VersionedRelation.lastScan(t).get
    assert(info.kept < info.total,
      s"SQL WHERE must reach the file planner: $info")
    // non-graft relations pass through untouched
    intercept[Exception] { spark.sql("SELECT * FROM nograft.`/nope`") }
  }

  test("SQL: VERSION AS OF and TIMESTAMP AS OF time-travel; bad version refuses") {
    val t = tmpDir("gtable-sqltt") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1")) ==
      Set((1L, "a")))
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 2")) ==
      Set((1L, "a"), (2L, "b")))
    val ts1 = Versioned.readManifest(spark, t, 1L).ts.get
    val lit = new java.sql.Timestamp(ts1).toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace('T', ' ')
    assert(rows(spark.sql(
      s"SELECT * FROM graft.`$t` TIMESTAMP AS OF '$lit'")) == Set((1L, "a")))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 'abc'").collect()
    }
    assert(e.getMessage.contains("commit number"))
  }

  test("SQL: INSERT INTO appends through appendRebase; INSERT OVERWRITE replaces") {
    val t = tmpDir("gtable-insert") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    spark.sql(s"INSERT INTO graft.`$t` VALUES (2, 'b'), (3, 'c')")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(Versioned.latestVersion(spark, t) == Some(2L))
    spark.sql(s"INSERT OVERWRITE graft.`$t` VALUES (9, 'z')")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) == Set((9L, "z")))
  }

  test("pruningPredicates: supported shapes translate, unsupported vanish") {
    val preds = VersionedRelation.pruningPredicates(Array(
      EqualTo("a", 5L),
      And(GreaterThan("b", 10), LessThanOrEqual("b", 20)),
      In("c", Array[Any](3, 1, 2)),
      IsNull("d"), IsNotNull("e"),
      EqualNullSafe("f", null),
      Or(EqualTo("g", 1), EqualTo("g", 2)), // disjunction: dropped
      EqualTo("h.nested", 1),               // nested: dropped
      EqualTo("i", true),                   // boolean literal: dropped
      StringStartsWith("j", "x")))          // unsupported: dropped
    assert(preds == Seq(
      ScanPredicate.Bounds("a", Some("5"), Some("5")),
      ScanPredicate.Bounds("b", Some("10"), None),
      ScanPredicate.Bounds("b", None, Some("20")),
      ScanPredicate.InSet("c", Seq("3", "1", "2")),
      ScanPredicate.NullCheck("d", isNull = true),
      ScanPredicate.NullCheck("e", isNull = false),
      ScanPredicate.NullCheck("f", isNull = true)))
  }

  test("readPruned: IS NULL / IS NOT NULL prune on manifest null counts") {
    val t = tmpDir("gtable-null") + "/t"
    // two dirs: one all-null `v`, one never-null `v`
    Versioned.commitWithStats(spark,
      t, Seq((1L, Option.empty[java.lang.Long]), (2L, Option.empty[java.lang.Long]))
        .toDF("id", "v"), Seq("id", "v"))
    Versioned.commitWithStats(spark,
      t, Seq((3L, Option(java.lang.Long.valueOf(30L))),
             (4L, Option(java.lang.Long.valueOf(40L)))).toDF("id", "v"),
      Seq("id", "v"))
    val (isNull, k1, t1) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.NullCheck("v", isNull = true)))
    assert(isNull.filter($"v".isNull).count() == 2 && k1 < t1,
      s"IS NULL must drop the never-null file: kept $k1 of $t1")
    val (notNull, k2, t2) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.NullCheck("v", isNull = false)))
    assert(notNull.filter($"v".isNotNull).count() == 2 && k2 < t2,
      s"IS NOT NULL must drop the all-null file: kept $k2 of $t2")
  }

  test("readPruned: multi-predicate conjunction intersects decisions") {
    val t = tmpDir("gtable-multi") + "/t"
    seedSorted(t)
    val one = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("id", Some("50"), None)))
    val both = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("id", Some("50"), None),
        ScanPredicate.Bounds("id", None, Some("80"))))
    assert(both._2 < one._2,
      s"adding the upper bound must prune further: ${both._2} vs ${one._2}")
    assert(rows(both._1.filter($"id".between(50L, 80L))) ==
      (50 to 80).map(i => (i.toLong, s"s$i")).toSet)
  }
}
