package graft

import graft.ops.Versioned

/** SQL DML over graft tables (GraftSqlRule command substitution →
  * deleteWhere / updateWhere / mergeApply): semantics, protocol shape
  * (dv deletes, MoR updates, one-commit merges), refusal taxonomy, and
  * that EXPLAIN does not execute.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def seed(t: String): Unit =
    Versioned.commit(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s"))

  test("DELETE FROM: condition routes to dv tombstones, data files untouched") {
    val t = tmpDir("dml-del") + "/t"
    seed(t)
    val filesBefore = new java.io.File(s"$t/data").listFiles().flatMap(
      _.listFiles()).map(f => (f.getPath, f.length(), f.lastModified())).toSet
    spark.sql(s"DELETE FROM graft.`$t` WHERE id % 2 = 0")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (3L, "c")))
    assert(Versioned.latestVersion(spark, t) == Some(2L))
    val filesAfter = new java.io.File(s"$t/data").listFiles().flatMap(
      _.listFiles()).map(f => (f.getPath, f.length(), f.lastModified())).toSet
    assert(filesBefore.subsetOf(filesAfter),
      "SQL DELETE must be merge-on-read: no data file rewrites")
    // time travel still sees the pre-delete snapshot
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1")).size == 4)
  }

  test("DELETE FROM without WHERE empties the table (parser's TRUE literal)") {
    val t = tmpDir("dml-delall") + "/t"
    seed(t)
    spark.sql(s"DELETE FROM graft.`$t`")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 0)
  }

  test("UPDATE: SET + WHERE route to merge-on-read updateWhere") {
    val t = tmpDir("dml-upd") + "/t"
    seed(t)
    spark.sql(s"UPDATE graft.`$t` SET s = concat(s, '!') WHERE id >= 3")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c!"), (4L, "d!")))
    // one commit; old snapshot intact
    assert(Versioned.latestVersion(spark, t) == Some(2L))
    assert(rows(Versioned.read(spark, t, Some(1L))) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("UPDATE without WHERE touches every row") {
    val t = tmpDir("dml-updall") + "/t"
    seed(t)
    spark.sql(s"UPDATE graft.`$t` SET s = upper(s)")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D")))
  }

  test("MERGE INTO: matched UPDATE + conditional DELETE + not-matched INSERT, one commit") {
    val t = tmpDir("dml-merge") + "/t"
    seed(t)
    Seq((2L, "B2"), (3L, "DIE"), (9L, "I9"))
      .toDF("id", "s").createOrReplaceTempView("dml_merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_merge_src src
         |ON tgt.id = src.id
         |WHEN MATCHED AND src.s = 'DIE' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET s = concat(src.s, '+')
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("dml_merge_src")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "B2+"), (4L, "d"), (9L, "I9")))
    assert(Versioned.latestVersion(spark, t) == Some(2L),
      "the whole MERGE must land as ONE commit")
  }

  test("MERGE INTO: delete-only and insert-only clause subsets work") {
    val t = tmpDir("dml-merge2") + "/t"
    seed(t)
    Seq((1L, "x"), (7L, "n")).toDF("id", "s")
      .createOrReplaceTempView("dml_merge_src2")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_merge_src2 src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((2L, "b"), (3L, "c"), (4L, "d")))
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_merge_src2 src
         |ON tgt.id = src.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("dml_merge_src2")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "x"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "n")))
  }

  test("MERGE refusals: non-equi ON, conditional UPDATE, reshaping INSERT, by-source") {
    val t = tmpDir("dml-merge3") + "/t"
    seed(t)
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("dml_merge_src3")
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.toLowerCase.contains(frag.toLowerCase),
        s"expected '$frag' in: ${e.getMessage.take(300)}")
    }
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id < src.id WHEN MATCHED THEN DELETE""".stripMargin,
      "ON target.k = source.k")
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id = src.id
           |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, upper(src.s))"""
        .stripMargin,
      "same-named source column")
    // the engine's clause precedence is delete-first: an UPDATE written
    // before a DELETE would silently diverge from first-match SQL
    // semantics, so it refuses
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id = src.id
           |WHEN MATCHED AND src.s = 'x' THEN UPDATE SET s = src.s
           |WHEN MATCHED THEN DELETE""".stripMargin,
      "DELETE before")
    // NOT MATCHED BY SOURCE conditions speak target-only vocabulary —
    // Spark's own analyzer already refuses a source reference there
    // (resolution scope excludes the source side), before the
    // translator's rebindTargetOnly defense could
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id = src.id
           |WHEN NOT MATCHED BY SOURCE AND src.s = 'x' THEN DELETE""".stripMargin,
      "cannot be resolved")
    spark.catalog.dropTempView("dml_merge_src3")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")).size == 4,
      "refused statements must leave the table untouched")
  }

  test("MERGE clause conditions: conditional matched UPDATE leaves " +
      "non-matching rows IN PLACE; conditional INSERT filters the source") {
    val t = tmpDir("dml-merge-cond") + "/t"
    seed(t) // rows (1,a) (2,b) (3,c) (4,d)
    Seq((1L, "U1"), (2L, "U2"), (8L, "N8"), (9L, "N9"))
      .toDF("id", "s").createOrReplaceTempView("dml_mc_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_mc_src src
         |ON tgt.id = src.id
         |WHEN MATCHED AND tgt.id = 2 THEN UPDATE SET s = src.s
         |WHEN NOT MATCHED AND src.id = 9 THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("dml_mc_src")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "U2"), (3L, "c"), (4L, "d"), (9L, "N9")),
      "id=1 fails the update condition and stays; id=8 fails the insert condition")
    // the untouched matched row produced NO dv and NO CDF noise
    val feed = Versioned.changes(spark, t, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set((2L, "b", "delete"), (2L, "U2", "insert"),
      (9L, "N9", "insert")),
      s"only the updated and inserted rows may appear in the feed: $feed")
  }

  test("MERGE insert-only statement leaves matched rows untouched " +
      "(no silent replace-image)") {
    val t = tmpDir("dml-merge-insonly") + "/t"
    seed(t)
    Seq((1L, "CLOBBER"), (7L, "n7")).toDF("id", "s")
      .createOrReplaceTempView("dml_io_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_io_src src
         |ON tgt.id = src.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("dml_io_src")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "n7")),
      "an insert-only MERGE must not rewrite matched rows with source images")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: conditional DELETE and UPDATE " +
      "over target-only vocabulary") {
    val t = tmpDir("dml-merge-nmbs") + "/t"
    seed(t) // (1,a) (2,b) (3,c) (4,d)
    Seq((2L, "U2")).toDF("id", "s").createOrReplaceTempView("dml_nmbs_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING dml_nmbs_src src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET s = src.s
         |WHEN NOT MATCHED BY SOURCE AND tgt.id = 3 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND tgt.s = 'd'
         |  THEN UPDATE SET s = concat(tgt.s, '!')""".stripMargin)
    spark.catalog.dropTempView("dml_nmbs_src")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "U2"), (4L, "d!")),
      "id=3 deletes by source-absence, id=4 updates, id=1 is untouched")
    assert(Versioned.latestVersion(spark, t) == Some(2L),
      "the whole five-clause MERGE must land as ONE commit")
  }

  test("name-based catalog access: CREATE TABLE USING graft-table, INSERT, " +
      "DML, and time travel all speak the table NAME") {
    val t = tmpDir("dml-ddl") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_ddl_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("g_ddl_seed")
    spark.sql(s"CREATE TABLE g_ddl_t USING `graft-table` LOCATION '$t' " +
      "AS SELECT id, s FROM g_ddl_seed")
    assert(rows(spark.sql("SELECT * FROM g_ddl_t")) ==
      Set((1L, "a"), (2L, "b")), "CTAS must seed v1 and read back by name")
    spark.sql("INSERT INTO g_ddl_t VALUES (3, 'c')")
    assert(rows(spark.sql("SELECT * FROM g_ddl_t")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "read-your-writes by name (the relation cache must not serve v1)")
    spark.sql("DELETE FROM g_ddl_t WHERE id = 1")
    spark.sql("UPDATE g_ddl_t SET s = 'B' WHERE id = 2")
    assert(rows(spark.sql("SELECT * FROM g_ddl_t")) ==
      Set((2L, "B"), (3L, "c")))
    assert(rows(spark.sql("SELECT * FROM g_ddl_t VERSION AS OF 1")) ==
      Set((1L, "a"), (2L, "b")),
      "time travel must resolve the NAME through the catalog's location")
    assert(Versioned.latestVersion(spark, t) == Some(4L),
      "CTAS + three statements must land four commits")
    spark.sql("DROP TABLE g_ddl_t")
    spark.catalog.dropTempView("g_ddl_seed")
  }

  test("maintenance SQL: OPTIMIZE ZORDER BY folds + re-sorts, DESCRIBE " +
      "HISTORY lists commits, VACUUM sweeps — content invariant") {
    val t = tmpDir("dml-maint") + "/t"
    seed(t)
    Versioned.commit(spark, t, Seq((9L, "i")).toDF("id", "s"))
    val before = rows(spark.sql(s"SELECT * FROM graft.`$t`"))
    val v = spark.sql(s"OPTIMIZE graft.`$t` ZORDER BY (id)")
      .collect().head.getLong(0)
    assert(v == 3L)
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$t`").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L) &&
      hist.map(_.getString(1)).toSeq == Seq("overwrite", "append", "append"),
      s"history must be newest-first: ${hist.mkString(",")}")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) == before,
      "OPTIMIZE must be invisible to readers")
    // RESTORE rolls the head back (metadata-only, history preserved) —
    // it must run BEFORE vacuum, which would sweep the target's dirs
    val rv = spark.sql(s"RESTORE TABLE graft.`$t` TO VERSION AS OF 1")
      .collect().head.getLong(0)
    assert(rv == 4L, "RESTORE lands a new commit")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      "RESTORE must present the target snapshot")
    val swept = spark.sql(s"VACUUM graft.`$t`").collect()
    assert(swept.nonEmpty, "the dirs the restored head dropped must sweep")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      "vacuum must be invisible to the live snapshot")
    // plain SQL still parses through the delegate
    assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
    // unknown targets refuse loudly
    val e = intercept[Exception](spark.sql("VACUUM no_such_graft_table"))
    assert(e.getMessage.contains("not found"),
      s"unknown maintenance target must refuse: ${e.getMessage.take(120)}")
  }

  test("CREATE TABLE with an explicit schema on an EMPTY location seeds an " +
      "empty v1; INSERT and DML work immediately") {
    val t = tmpDir("dml-ddl-empty") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_ddl_empty")
    spark.sql(s"CREATE TABLE g_ddl_empty (id BIGINT, s STRING) " +
      s"USING `graft-table` LOCATION '$t'")
    assert(spark.sql("SELECT * FROM g_ddl_empty").count() == 0L)
    assert(Versioned.latestVersion(spark, t) == Some(1L),
      "declared-schema creation must seed an empty v1")
    spark.sql("INSERT INTO g_ddl_empty VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM g_ddl_empty WHERE id = 1")
    assert(rows(spark.sql("SELECT * FROM g_ddl_empty")) == Set((2L, "b")))
    spark.sql("DROP TABLE g_ddl_empty")
    // re-creating over an EXISTING table with a mismatched schema refuses
    spark.sql("DROP TABLE IF EXISTS g_ddl_mismatch")
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE g_ddl_mismatch (id INT, wrong DOUBLE) " +
        s"USING `graft-table` LOCATION '$t'"))
    assert(e.getMessage.contains("does not match"),
      s"schema mismatch must refuse: ${e.getMessage.take(200)}")
  }

  test("maintenance SQL resolves NAMED graft tables through the catalog") {
    val t = tmpDir("dml-maint-name") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_maint_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("g_maint_seed")
    spark.sql(s"CREATE TABLE g_maint_t USING `graft-table` LOCATION '$t' " +
      "AS SELECT id, s FROM g_maint_seed")
    spark.sql("INSERT INTO g_maint_t VALUES (3, 'c')")
    assert(spark.sql("OPTIMIZE g_maint_t").collect().head.getLong(0) == 3L)
    assert(spark.sql("DESCRIBE HISTORY g_maint_t").count() == 3L)
    assert(spark.sql("VACUUM g_maint_t RETAIN 1 VERSIONS").collect().nonEmpty)
    assert(rows(spark.sql("SELECT * FROM g_maint_t")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("DROP TABLE g_maint_t")
    spark.catalog.dropTempView("g_maint_seed")
  }

  test("graft_changes table function: the CDF of a version range from " +
      "pure SQL; non-literal args refuse") {
    val t = tmpDir("dml-tvf") + "/t"
    seed(t) // v1: (1,a)(2,b)(3,c)(4,d)
    Versioned.deleteWhere(spark, t, $"id" % 2L === 0L) // v2
    Versioned.commit(spark, t, Seq((9L, "i")).toDF("id", "s")) // v3
    val got = spark.sql(
      s"SELECT _commit_version, _change_type, id, s " +
        s"FROM graft_changes('$t', 2, 3) ORDER BY _commit_version, id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, "delete", 2L), (2L, "delete", 4L),
      (3L, "insert", 9L)),
      s"the TVF must emit each commit's row-level delta: $got")
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$t', 2, 1)"))
    assert(e.getMessage.contains("fromVersion <= toVersion"),
      s"an inverted range must refuse: ${e.getMessage.take(120)}")
  }

  test("EXPLAIN on DML shows the command without executing it") {
    val t = tmpDir("dml-explain") + "/t"
    seed(t)
    val plan = spark.sql(s"EXPLAIN DELETE FROM graft.`$t` WHERE id = 1")
      .collect().map(_.getString(0)).mkString
    assert(plan.contains("GraftDeleteCommand"))
    assert(Versioned.latestVersion(spark, t) == Some(1L),
      "EXPLAIN must not run the delete")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 4)
  }

  test("DML conditions with subqueries refuse loudly") {
    val t = tmpDir("dml-subq") + "/t"
    seed(t)
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft.`$t` WHERE id IN " +
        s"(SELECT id FROM graft.`$t` WHERE s = 'a')")
    }
    assert(e.getMessage.contains("subquer"),
      s"expected a subquery refusal, got: ${e.getMessage.take(200)}")
  }

  test("a plain schema-specified READ of an empty location never mutates " +
      "storage — no seed commit, empty rows, first INSERT seeds (ADVICE r12)") {
    val t = tmpDir("dml-readseed") + "/t"
    val s = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, s STRING")
    val df = spark.read.schema(s).format("graft-table").load(t)
    assert(df.count() == 0L)
    assert(Versioned.latestVersion(spark, t).isEmpty,
      "a read must not create a table at a typo'd/empty path")
    // the declared-schema relation still accepts a write verb
    Seq((1L, "a")).toDF("id", "s").write.format("graft-table")
      .mode("append").save(t)
    assert(Versioned.latestVersion(spark, t) == Some(1L))
  }

  test("schema-specified read with a SUBSET of the recorded schema serves " +
      "the declared projection; unknown/re-typed fields refuse") {
    val t = tmpDir("dml-subset") + "/t"
    seed(t)
    val sub = org.apache.spark.sql.types.StructType.fromDDL("s STRING")
    val df = spark.read.schema(sub).format("graft-table").load(t)
    assert(df.columns.toSeq == Seq("s"))
    assert(df.as[String].collect().toSet == Set("a", "b", "c", "d"))
    val bad = org.apache.spark.sql.types.StructType.fromDDL("id INT")
    val e = intercept[Exception](
      spark.read.schema(bad).format("graft-table").load(t).collect())
    assert(e.getMessage.contains("does not match"))
  }

  test("MERGE with a NOT MATCHED BY SOURCE clause into a freshly created " +
      "EMPTY table is a no-op on the clause, not a crash (ADVICE r12)") {
    val t = tmpDir("dml-nmbs-empty") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_nmbs_empty")
    spark.sql(s"CREATE TABLE g_nmbs_empty (id BIGINT, s STRING) " +
      s"USING `graft-table` LOCATION '$t'")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("g_nmbs_src")
    spark.sql("""MERGE INTO g_nmbs_empty tgt USING g_nmbs_src src
      ON tgt.id = src.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows(spark.sql("SELECT * FROM g_nmbs_empty")) ==
      Set((1L, "a"), (2L, "b")))
    spark.sql("DROP TABLE g_nmbs_empty")
    spark.catalog.dropTempView("g_nmbs_src")
  }

  test("SQL ALTER TABLE: ADD/DROP CONSTRAINT + RENAME/DROP COLUMN on a " +
      "graft path literal — metadata-only, time travel speaks old names") {
    val t = tmpDir("dml-alter") + "/t"
    seed(t)
    spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT id_pos CHECK (id > 0)")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO graft.`$t` VALUES (-1, 'x')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(5).exists(x => Option(x.getMessage).exists(_.contains("id_pos"))),
      s"constraint must reject: ${e.getMessage.take(150)}")
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT id_pos")
    val dirsBefore = new java.io.File(s"$t/data").list().toSet
    assert(spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN s TO label")
      .collect().head.getLong(0) == 4L)
    assert(new java.io.File(s"$t/data").list().toSet == dirsBefore,
      "SQL RENAME COLUMN must be metadata-only")
    // post-rename INSERT routes through the mapped-append verb
    spark.sql(s"INSERT INTO graft.`$t` VALUES (5, 'e')")
    assert(rows(spark.sql(s"SELECT id, label FROM graft.`$t`")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // time travel to v1 answers under the OLD name
    assert(rows(spark.sql(s"SELECT id, s FROM graft.`$t` VERSION AS OF 1")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN label")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq == Seq("id"))
  }

  test("SQL ALTER TABLE on a NAMED graft table keeps the catalog schema " +
      "in step; ALTER on a non-graft table delegates to vanilla") {
    val t = tmpDir("dml-altername") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_alter_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("g_alter_seed")
    spark.sql(s"CREATE TABLE g_alter_t USING `graft-table` LOCATION '$t' " +
      "AS SELECT id, s FROM g_alter_seed")
    spark.sql("ALTER TABLE g_alter_t RENAME COLUMN s TO label")
    // name-based read AFTER the rename must resolve (catalog schema synced)
    assert(rows(spark.sql("SELECT id, label FROM g_alter_t")) ==
      Set((1L, "a"), (2L, "b")))
    spark.sql("INSERT INTO g_alter_t VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM g_alter_t").count() == 3L)
    spark.sql("DROP TABLE g_alter_t")
    spark.catalog.dropTempView("g_alter_seed")
    // non-graft target: delegation, so vanilla refuses with ITS error
    spark.sql("DROP TABLE IF EXISTS plain_alter_t")
    spark.sql("CREATE TABLE plain_alter_t (a INT, b STRING) USING parquet " +
      s"LOCATION '${tmpDir("dml-plainalter")}/t'")
    try {
      val e = intercept[Exception](
        spark.sql("ALTER TABLE plain_alter_t RENAME COLUMN a TO z"))
      assert(!e.getMessage.contains("graft"),
        s"vanilla tables must get vanilla errors: ${e.getMessage.take(150)}")
    } finally spark.sql("DROP TABLE IF EXISTS plain_alter_t")
  }

  test("CREATE OR REPLACE TABLE: overwrite commit with history intact; " +
      "DROP + recreate re-binds the same storage") {
    val t = tmpDir("dml-replace") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_rep_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("g_rep_seed")
    spark.sql(s"CREATE TABLE g_rep_t USING `graft-table` LOCATION '$t' " +
      "AS SELECT id, s FROM g_rep_seed")
    spark.sql("INSERT INTO g_rep_t VALUES (3, 'c')")
    // replace with a DIFFERENT projection — one overwrite commit (v3)
    val v = spark.sql("CREATE OR REPLACE TABLE g_rep_t USING `graft-table` " +
      "AS SELECT id * 10 AS id, upper(s) AS s FROM g_rep_seed")
      .collect().head.getLong(0)
    assert(v == 3L, s"replace must be one more version, got $v")
    assert(rows(spark.sql("SELECT * FROM g_rep_t")) ==
      Set((10L, "A"), (20L, "B")))
    // history intact: pre-replace snapshots still answer
    assert(spark.sql("DESCRIBE HISTORY g_rep_t").count() == 3L)
    assert(rows(spark.sql("SELECT * FROM g_rep_t VERSION AS OF 2")) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // declared-schema replace lands an EMPTY snapshot (v4)
    spark.sql("CREATE OR REPLACE TABLE g_rep_t (id BIGINT, s STRING) " +
      "USING `graft-table`")
    assert(spark.sql("SELECT * FROM g_rep_t").count() == 0L)
    // drop unregisters the NAME; storage and history survive
    spark.sql("DROP TABLE g_rep_t")
    assert(!spark.catalog.tableExists("g_rep_t"))
    assert(Versioned.latestVersion(spark, t) == Some(4L))
    // recreate over the existing location re-binds the history
    spark.sql(s"CREATE TABLE g_rep_t (id BIGINT, s STRING) " +
      s"USING `graft-table` LOCATION '$t'")
    assert(rows(spark.sql("SELECT * FROM g_rep_t VERSION AS OF 3")) ==
      Set((10L, "A"), (20L, "B")))
    // replace with LOCATION on an unregistered name creates the entry
    spark.sql("DROP TABLE g_rep_t")
    spark.sql(s"CREATE OR REPLACE TABLE g_rep_t USING `graft-table` " +
      s"LOCATION '$t' AS SELECT id, s FROM g_rep_seed")
    assert(spark.sql("SELECT * FROM g_rep_t").count() == 2L)
    assert(spark.sql("DESCRIBE HISTORY g_rep_t").count() >= 5L)
    spark.sql("DROP TABLE g_rep_t")
    spark.catalog.dropTempView("g_rep_seed")
  }

  test("PARTITIONED BY graft table: sticky hive layout on every append; " +
      "reads, pruning, dv deletes, CDF and time travel all compose") {
    val t = tmpDir("dml-part") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_part_t")
    spark.sql(s"CREATE TABLE g_part_t (id BIGINT, grp STRING, v DOUBLE) " +
      s"USING `graft-table` PARTITIONED BY (grp) LOCATION '$t'")
    try {
      spark.sql(
        "INSERT INTO g_part_t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)")
      // the SQL INSERT's dir physically carries the hive layout
      val dirs = new java.io.File(s"$t/data").listFiles().filter(_.isDirectory)
      assert(dirs.exists(_.listFiles().exists(f =>
        f.isDirectory && f.getName.startsWith("__p_grp="))),
        s"INSERT must stage hive-layout dirs: ${dirs.map(_.getName).toSeq}")
      // reads: real columns, no layout pollution
      val head = spark.sql("SELECT * FROM g_part_t ORDER BY id")
      assert(head.columns.toSeq == Seq("id", "grp", "v"))
      assert(head.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "a")))
      // a DataFrame append honors the sticky layout too
      Seq((4L, "c", 4.0)).toDF("id", "grp", "v")
        .write.format("graft-table").mode("append").save(t)
      assert(spark.sql("SELECT COUNT(1) AS c FROM g_part_t")
        .head().getLong(0) == 4L)
      // partition pruning through the ordinary stats decision
      val (pruned, kept, total) = Versioned.readPruned(spark, t, None,
        Seq(Versioned.ScanPredicate.Bounds("grp", Some("a"), Some("a"))))
      assert(kept > 0 && kept < total,
        s"the partition predicate must prune files: $kept/$total")
      assert(pruned.filter($"grp" === "a").count() == 2L)
      // dv delete + CDF + time travel on the partitioned layout
      Versioned.deleteWhere(spark, t, $"id" === 3L)
      assert(spark.sql("SELECT COUNT(1) AS c FROM g_part_t")
        .head().getLong(0) == 3L)
      val ch = Versioned.changes(spark, t,
        Versioned.latestVersion(spark, t).get)
      assert(ch.collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[String]("change_type"))).toSet ==
        Set((3L, "delete")))
      assert(spark.sql("SELECT COUNT(1) AS c FROM g_part_t VERSION AS OF 3")
        .head().getLong(0) == 4L)
      // the declared layout cannot be silently re-partitioned by appends
      intercept[IllegalArgumentException](Versioned.commitPartitioned(spark,
        t, Seq((9L, "z", 9.0)).toDF("id", "grp", "v"), Seq("v")))
      // OPTIMIZE keeps the declaration AND the layout: content identical,
      // partcols survive, and the NEXT append still stages partitioned
      val before = spark.sql("SELECT * FROM g_part_t").collect()
        .map(_.toSeq).toSet
      Versioned.compact(spark, t, numFiles = 2)
      assert(spark.sql("SELECT * FROM g_part_t").collect()
        .map(_.toSeq).toSet == before, "OPTIMIZE must be content-invisible")
      Seq((5L, "a", 5.0)).toDF("id", "grp", "v")
        .write.format("graft-table").mode("append").save(t)
      val postDirs = new java.io.File(s"$t/data").listFiles()
        .filter(_.isDirectory).sortBy(_.getName)
      assert(postDirs.last.listFiles().exists(f =>
        f.isDirectory && f.getName.startsWith("__p_grp=")),
        "appends after OPTIMIZE must still stage the declared layout")
      // SHOW PARTITIONS: metadata-only listing, path and name targets
      assert(spark.sql(s"SHOW PARTITIONS graft.`$t`")
        .collect().map(_.getString(0)).toSet ==
        Set("grp=a", "grp=b", "grp=c"))
      assert(spark.sql("SHOW PARTITIONS g_part_t")
        .collect().map(_.getString(0)).toSet ==
        Set("grp=a", "grp=b", "grp=c"))
      // an unpartitioned graft table refuses loudly
      val t2 = tmpDir("dml-part-flat") + "/t"
      Versioned.commit(spark, t2, Seq((1L, "x")).toDF("id", "s"))
      val e = intercept[Exception](spark.sql(s"SHOW PARTITIONS graft.`$t2`"))
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(5).exists(x => Option(x.getMessage)
          .exists(_.contains("not a partitioned table"))))
    } finally spark.sql("DROP TABLE IF EXISTS g_part_t")
  }

  test("ALTER TABLE ADD COLUMN: metadata-only field-union commit — typed " +
      "NULLs before the first write, no table feature tripped") {
    val t = tmpDir("dml-addcol") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val dirsBefore = new java.io.File(s"$t/data").list().toSet
    val v = spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN score DOUBLE")
      .collect().head.getLong(0)
    assert(v == 2L)
    assert(new java.io.File(s"$t/data").list().toSet == dirsBefore,
      "ADD COLUMN must write zero data dirs")
    // typed NULLs on both the plain and the PRUNED read path
    val head = spark.sql(s"SELECT * FROM graft.`$t` ORDER BY id")
    assert(head.schema.map(f => (f.name, f.dataType.sql)) ==
      Seq(("id", "BIGINT"), ("s", "STRING"), ("score", "DOUBLE")))
    assert(head.collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq ==
      Seq((1L, true), (2L, true)))
    assert(spark.read.format("graft-table").load(t)
      .filter($"id" === 2L).select($"score").collect().head.isNullAt(0),
      "the pruned relation path must null-fill the added column too")
    // NO feature gate: a plain DataFrame append still works, speaking
    // the new column...
    spark.read.format("graft-table").load(t) // resolves pre-append head
    Seq((3L, "c", 0.5)).toDF("id", "s", "score")
      .write.format("graft-table").mode("append").save(t)
    assert(spark.sql(s"SELECT COUNT(score) AS c FROM graft.`$t`")
      .head().getLong(0) == 1L)
    // ...and so does one NOT speaking it (an old writer): null-filled
    Seq((4L, "d")).toDF("id", "s")
      .write.format("graft-table").mode("append").save(t)
    val fin = spark.sql(
      s"SELECT id, score FROM graft.`$t` ORDER BY id").collect()
    assert(fin.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(fin.map(r => r.isNullAt(1)).toSeq == Seq(true, true, false, true))
    // time travel pre-add answers WITHOUT the column
    assert(!spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1")
      .columns.contains("score"))
    // CDF straddles the metadata commit: version 2's change set is empty
    assert(Versioned.changes(spark, t, 2L).count() == 0L,
      "a metadata-only ADD COLUMN must emit an empty change set")
    // duplicate add refuses
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN score DOUBLE"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(5).exists(x => Option(x.getMessage)
        .exists(_.contains("already exists"))))
  }

  test("CREATE OR REPLACE TABLE with parenthesized types (DECIMAL(p,s)) " +
      "matches the graft path — the column list is paren-balanced") {
    // a ([^)]*) regex column-list capture stops at DECIMAL(10,2)'s inner
    // ')' and demotes the statement to the vanilla v2 path, which refuses
    // v1 providers (ADVICE r13)
    val t = tmpDir("dml-replace-dec") + "/t"
    spark.sql("DROP TABLE IF EXISTS g_repdec_t")
    spark.sql("CREATE OR REPLACE TABLE g_repdec_t " +
      "(id BIGINT, price DECIMAL(10,2), tag VARCHAR(20)) " +
      s"USING `graft-table` LOCATION '$t'")
    try {
      val sch = spark.table("g_repdec_t").schema
      assert(sch.map(f => (f.name, f.dataType.sql)).toSeq ==
        Seq(("id", "BIGINT"), ("price", "DECIMAL(10,2)"), ("tag", "STRING")),
        s"declared parameterized types must land: ${sch.treeString}")
      spark.sql("INSERT INTO g_repdec_t VALUES (1, 12.34, 'a')")
      assert(spark.sql("SELECT CAST(price AS STRING) FROM g_repdec_t")
        .collect().map(_.getString(0)).toSeq == Seq("12.34"))
      // replace again with a paren-typed schema: still one more version
      spark.sql("CREATE OR REPLACE TABLE g_repdec_t " +
        "(id BIGINT, price DECIMAL(12,4)) USING `graft-table`")
      assert(spark.table("g_repdec_t").schema("price").dataType.sql ==
        "DECIMAL(12,4)")
    } finally spark.sql("DROP TABLE IF EXISTS g_repdec_t")
  }

  test("concurrent column renames both land — the metadata CAS retry") {
    val t = tmpDir("dml-alterrace") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a", 10L)).toDF("id", "s", "x"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = Seq(("s", "s2"), ("x", "x2")).map { case (f, to) =>
      new Thread(() => {
        try { Versioned.renameColumn(spark, t, f, to); () }
        catch { case e: Throwable => errs.add(e); () }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    assert(errs.isEmpty, s"racing renames must both land: ${errs.peek()}")
    assert(Versioned.latestVersion(spark, t) == Some(3L))
    assert(Versioned.read(spark, t).columns.toSeq == Seq("id", "s2", "x2"))
  }

  test("DESCRIBE DETAIL answers from one manifest read; vanilla targets " +
      "delegate") {
    val t = tmpDir("dml-detail") + "/t"
    seed(t)
    spark.sql(s"DELETE FROM graft.`$t` WHERE id = 1")
    val r = spark.sql(s"DESCRIBE DETAIL graft.`$t`").collect().head
    assert(r.getString(0) == "graft-table" && r.getLong(2) == 2L &&
      r.getString(3) == "delete" && r.getInt(4) == 1 && r.getInt(5) == 1,
      s"detail row wrong: $r")
    // a non-graft DESCRIBE DETAIL form delegates to vanilla (and fails
    // with a vanilla error, not a graft one)
    val e = intercept[Exception](
      spark.sql("DESCRIBE DETAIL no_such_table_xyz").collect())
    assert(!e.getMessage.contains("graft"),
      s"non-graft targets must get vanilla errors: ${e.getMessage.take(120)}")
  }

  test("ANALYZE TABLE retrofits stats manifests: conservative scans " +
      "become pruned, idempotent, NDV optional") {
    import graft.ops.Versioned
    val t = tmpDir("dml-analyze") + "/t"
    // three PLAIN commits (no write-time stats), key-disjoint ranges
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      Versioned.commit(spark, t, spark.range(lo, hi)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k"))
    }
    val (_, k0, t0) = Versioned.skipRead(spark, t, "k", "110", "130")
    assert(k0 == t0, s"no stats yet — every file scans: $k0/$t0")
    val res = spark.sql(
      s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS").collect().head
    assert(res.getLong(0) == 3L && res.getLong(1) == 3L)
    val (frame, k1, t1) = Versioned.skipRead(spark, t, "k", "110", "130")
    assert(k1 < t1, s"post-ANALYZE the range must prune: $k1/$t1")
    assert(frame.filter("k BETWEEN 110 AND 130").count() == 21L)
    // idempotent: nothing re-analyzed
    assert(spark.sql(s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS")
      .collect().head.getLong(0) == 0L)
    // FOR COLUMNS + WITH NDV
    val t2 = tmpDir("dml-analyze2") + "/t"
    Versioned.commit(spark, t2,
      spark.range(0, 500).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS s"))
    spark.sql(
      s"ANALYZE TABLE graft.`$t2` COMPUTE STATISTICS FOR COLUMNS k WITH NDV")
      .collect()
    val ndv = Versioned.approxNdv(spark, t2, "k")
    assert(ndv.exists(n => n > 450 && n < 550), s"NDV sketch off: $ndv")
    // WITH SKETCHES backfills quantile sketches on numeric columns
    val t3 = tmpDir("dml-analyze3") + "/t"
    Versioned.commit(spark, t3,
      spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS x",
        "CAST(id AS STRING) AS s"))
    spark.sql(s"ANALYZE TABLE graft.`$t3` COMPUTE STATISTICS WITH SKETCHES")
      .collect()
    val med = Versioned.approxQuantiles(spark, t3, "x", Seq(0.5)).get.head
    assert(math.abs(med - 500.0) <= 30.0, s"median sketch off: $med")
    // vanilla ANALYZE TABLE still reaches the vanilla engine
    spark.sql("DROP TABLE IF EXISTS dml_van_analyze")
    spark.sql("CREATE TABLE dml_van_analyze (c1 INT) USING parquet " +
      s"LOCATION '${tmpDir("dml-van-analyze")}/t'")
    try spark.sql("ANALYZE TABLE dml_van_analyze COMPUTE STATISTICS").collect()
    finally spark.sql("DROP TABLE IF EXISTS dml_van_analyze")
  }

  test("ANALYZE self-heals a broken stats manifest: an empty _stats husk " +
      "re-harvests instead of being skipped forever") {
    import graft.ops.Versioned
    // ADVICE r14 medium: pre-atomic-swap, a crash mid-backfill left an
    // existing-but-EMPTY _stats dir that bare-exists idempotency skipped
    // on every re-run — permanently broken. Idempotency now keys on a
    // USABLE manifest (>=1 parquet file) and the atomic swap moves the
    // husk aside.
    val t = tmpDir("dml-analyze-heal") + "/t"
    Versioned.commit(spark, t, spark.range(0, 100)
      .selectExpr("id AS k", "id * 2 AS v")
      .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k"))
    spark.sql(s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS").collect()
    val (_, k1, t1) = Versioned.skipRead(spark, t, "k", "10", "20")
    assert(k1 < t1, s"sanity: stats prune after ANALYZE: $k1/$t1")
    // simulate the crash artifact: smash _stats to an empty husk
    val dataDir = new java.io.File(s"$t/data").listFiles().head
    val statsDir = new java.io.File(dataDir, "_stats")
    statsDir.listFiles().foreach(_.delete())
    assert(statsDir.exists() && statsDir.listFiles().isEmpty)
    // re-run heals: the husk re-harvests (counts as analyzed work)
    val healed = spark.sql(s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS")
      .collect().head
    assert(healed.getLong(0) == 1L,
      s"an empty _stats husk must re-harvest, got ${healed.getLong(0)}")
    val (frame, k2, t2) = Versioned.skipRead(spark, t, "k", "10", "20")
    assert(k2 < t2, s"post-heal the range must prune again: $k2/$t2")
    assert(frame.filter("k BETWEEN 10 AND 20").count() == 11L)
    // and a fully-healthy table stays idempotent (nothing re-analyzed)
    assert(spark.sql(s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS")
      .collect().head.getLong(0) == 0L)
  }

  test("ANALYZE FOR COLUMNS on an evolved table: files lacking the column " +
      "stay scanned (manifest sentinel row)") {
    import graft.ops.Versioned
    val t = tmpDir("dml-analyze-evo") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "b", 10L)).toDF("id", "s", "extra"))
    spark.sql(
      s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS FOR COLUMNS extra")
      .collect()
    // the v1 file carries NO stats row for `extra`; without the sentinel
    // it would vanish from the kept set (silently dropped, not
    // conservatively kept) and the pre-evolution row would be lost
    val (frame, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(Versioned.ScanPredicate.Bounds("extra", Some("10"), Some("10"))))
    assert(kept == total,
      s"the stat-less file must be conservatively kept: $kept/$total")
    assert(frame.count() == 2,
      "the pre-evolution row must survive planning on the evolved column")
  }

  test("CREATE OR REPLACE TABLE ... PARTITIONED BY re-declares the layout") {
    val loc = tmpDir("dml-repl-part") + "/t"
    spark.sql("DROP TABLE IF EXISTS gdml_rp")
    spark.sql(s"CREATE TABLE gdml_rp (k BIGINT, s STRING) " +
      s"USING `graft-table` LOCATION '$loc'")
    spark.sql("INSERT INTO gdml_rp VALUES (1, 'a')")
    spark.sql(s"""CREATE OR REPLACE TABLE gdml_rp
      USING `graft-table` PARTITIONED BY (bucket(4, k)) LOCATION '$loc'
      AS SELECT id AS k, CAST(id AS STRING) AS s FROM range(40)""")
    assert(spark.sql("SELECT count(*) FROM gdml_rp").head().getLong(0) == 40L)
    val parts = spark.sql("SHOW PARTITIONS gdml_rp").collect()
    assert(parts.nonEmpty &&
      parts.forall(_.getString(0).startsWith("k_bucket=")))
    // the re-declared layout is sticky for later inserts
    spark.sql("INSERT INTO gdml_rp VALUES (100, 'x')")
    assert(spark.sql("SELECT count(*) FROM gdml_rp").head().getLong(0) == 41L)
    spark.sql("DROP TABLE gdml_rp")
  }

  test("VACUUM DRY RUN previews without deleting; RESTORE TIMESTAMP AS OF") {
    val t = tmpDir("dml-vacdry") + "/t"
    seed(t)
    Versioned.commit(spark, t, Seq((9L, "z")).toDF("id", "s"),
      overwrite = true)
    val preview = spark.sql(s"VACUUM graft.`$t` DRY RUN").collect()
      .map(_.getString(0)).toSeq
    assert(preview.nonEmpty)
    // the preview deleted NOTHING: the superseded snapshot still reads
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").count() == 4)
    val deleted = spark.sql(s"VACUUM graft.`$t`").collect()
      .map(_.getString(0)).toSeq
    assert(deleted == preview, "a real run must delete exactly the preview")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").collect()
    }
    // RESTORE TIMESTAMP AS OF: binds through versionAsOf, then the same
    // metadata-only rollback
    val t2 = tmpDir("dml-rts") + "/t"
    seed(t2)
    Thread.sleep(5)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    Versioned.commit(spark, t2, Seq((9L, "z")).toDF("id", "s"))
    spark.sql(s"RESTORE TABLE graft.`$t2` TO TIMESTAMP AS OF '$mid'")
      .collect()
    assert(spark.sql(s"SELECT * FROM graft.`$t2`").count() == 4,
      "restore must land on the pre-append snapshot")
    // date-only literals parse (session-zone semantics, like every other
    // TIMESTAMP literal — Timestamp.valueOf would reject this form)
    spark.sql(s"RESTORE TABLE graft.`$t2` TO TIMESTAMP AS OF '2999-01-01'")
      .collect()
    assert(spark.sql(s"SELECT * FROM graft.`$t2`").count() == 4)
  }

  test("SHOW CREATE TABLE reconstructs runnable DDL; vanilla targets delegate") {
    val loc = tmpDir("dml-showcreate") + "/t"
    spark.sql("DROP TABLE IF EXISTS gdml_sc")
    spark.sql(s"""CREATE TABLE gdml_sc (k BIGINT, ts TIMESTAMP, v DOUBLE)
      USING `graft-table` PARTITIONED BY (bucket(4, k), days(ts))
      LOCATION '$loc'""")
    spark.sql("ALTER TABLE gdml_sc ADD CONSTRAINT pos CHECK (v >= 0)")
    val stmts = spark.sql("SHOW CREATE TABLE gdml_sc").collect()
      .map(_.getString(0))
    assert(stmts.length == 2)
    assert(stmts.head.contains("PARTITIONED BY (bucket(4, k), days(ts))"),
      stmts.head)
    assert(stmts(1).contains("ADD CONSTRAINT pos CHECK"))
    // ROUND-TRIP: the emitted statements run against a fresh
    // name+location and rebuild the same table shape
    val loc2 = tmpDir("dml-showcreate2") + "/t"
    spark.sql("DROP TABLE IF EXISTS gdml_sc2")
    val emittedLoc = "LOCATION '([^']+)'".r
      .findFirstMatchIn(stmts.head).get.group(1)
    stmts.map(_.replace("gdml_sc", "gdml_sc2")
        .replace(s"LOCATION '$emittedLoc'", s"LOCATION '$loc2'"))
      .foreach(s0 => spark.sql(s0).collect())
    spark.sql("INSERT INTO gdml_sc2 VALUES " +
      "(1, TIMESTAMP '2024-01-01 00:00:00', 2.0)")
    assert(spark.sql("SHOW PARTITIONS gdml_sc2").collect()
      .map(_.getString(0))
      .exists(p => p.contains("k_bucket=") && p.contains("ts_day=2024-01-01")))
    intercept[Exception] {
      spark.sql("INSERT INTO gdml_sc2 VALUES " +
        "(2, TIMESTAMP '2024-01-01 00:00:00', -5.0)")
    } // the CHECK constraint round-tripped
    // DESCRIBE DETAIL prints the transforms in call form
    assert(spark.sql("DESCRIBE DETAIL gdml_sc").collect().head
      .getAs[String]("partitioning") == "bucket(4, k), days(ts)")
    // vanilla targets reach the vanilla SHOW CREATE TABLE
    spark.sql("DROP TABLE IF EXISTS dml_van_sc")
    spark.sql("CREATE TABLE dml_van_sc (c1 INT) USING parquet " +
      s"LOCATION '${tmpDir("dml-van-sc")}/t'")
    try assert(spark.sql("SHOW CREATE TABLE dml_van_sc").collect()
      .map(_.getString(0)).mkString.toLowerCase.contains("parquet"))
    finally {
      spark.sql("DROP TABLE IF EXISTS dml_van_sc")
      spark.sql("DROP TABLE IF EXISTS gdml_sc")
      spark.sql("DROP TABLE IF EXISTS gdml_sc2")
    }
  }

  test("DESCRIBE over a vanilla table named 'history' delegates instead of " +
      "being shadowed by DESCRIBE HISTORY interception (ADVICE r12)") {
    spark.sql("DROP TABLE IF EXISTS history")
    spark.sql("CREATE TABLE history (c1 INT, note STRING) USING parquet " +
      s"LOCATION '${tmpDir("dml-histname")}/history'")
    try {
      // vanilla column description: DESCRIBE <table> <column>
      val desc = spark.sql("DESCRIBE history note").collect()
      assert(desc.map(_.getString(0)).contains("col_name") ||
        desc.nonEmpty, "DESCRIBE history <col> must reach the vanilla parser")
      // and the graft form still works on actual graft targets
      val t = tmpDir("dml-histgraft") + "/t"
      seed(t)
      assert(spark.sql(s"DESCRIBE HISTORY graft.`$t`").count() == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS history")
  }
}
