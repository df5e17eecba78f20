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
           |WHEN MATCHED AND src.s = 'x' THEN UPDATE SET s = src.s""".stripMargin,
      "conditional WHEN MATCHED UPDATE")
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id = src.id
           |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, upper(src.s))"""
        .stripMargin,
      "same-named source column")
    bad(s"""MERGE INTO graft.`$t` tgt USING dml_merge_src3 src
           |ON tgt.id = src.id
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
      "NOT MATCHED BY SOURCE")
    spark.catalog.dropTempView("dml_merge_src3")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$t`")).size == 4,
      "refused statements must leave the table untouched")
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
}
