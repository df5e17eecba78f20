package graft

import graft.ops.Versioned

/** Column-mapping + table-feature laws: rename and drop are metadata-
  * only (zero files rewrite), reads project the manifest's own logical
  * schema per version, appends land under physical names, gated verbs
  * refuse loudly, unknown features refuse at readManifest, and a
  * compact materializes the logical view dropping the feature.
  */
class ColumnMappingSpec extends SparkSpec {

  import spark.implicits._

  private def dataFiles(t: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$t/data")).filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getPath}:${f.length()}").toSet
  }

  test("rename is metadata-only; reads are logical per version; appends land physical") {
    val t = tmpDir("colmap") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "v"))
    val before = dataFiles(t)
    val rv = Versioned.renameColumn(spark, t, "v", "amount")
    assert(rv == 2L && dataFiles(t) == before,
      "rename must write zero data files")
    // latest reads the new name; time travel shows the old
    assert(Versioned.read(spark, t).columns.toSeq == Seq("id", "s", "amount"))
    assert(Versioned.read(spark, t, Some(1L)).columns.toSeq == Seq("id", "s", "v"))
    assert(Versioned.read(spark, t).select($"amount").collect()
      .map(_.getLong(0)).toSet == Set(10L, 20L))
    // an append speaks the LOGICAL name and lands under the PHYSICAL one
    Versioned.commit(spark, t, Seq((3L, "c", 30L)).toDF("id", "s", "amount"))
    assert(Versioned.read(spark, t).select($"amount").collect()
      .map(_.getLong(0)).toSet == Set(10L, 20L, 30L),
      "old and new dirs must read as one logical column")
    val newDir = (dataFiles(t) -- before).map(_.split(':').head.split('/').dropRight(1).last)
    val raw = spark.read.parquet(s"$t/data/${newDir.head}")
    assert(raw.columns.contains("v") && !raw.columns.contains("amount"),
      s"the new dir must hold the physical name, got ${raw.columns.toSeq}")
    // rename again: amount -> total, physical stays v
    Versioned.renameColumn(spark, t, "amount", "total")
    assert(Versioned.read(spark, t).select($"total").collect()
      .map(_.getLong(0)).toSet == Set(10L, 20L, 30L))
  }

  test("drop hides the column logically; bytes remain until a rewrite") {
    val t = tmpDir("colmap-drop") + "/t"
    Versioned.commit(spark, t, Seq((1L, "x", 5L)).toDF("id", "s", "v"))
    Versioned.dropColumn(spark, t, "s")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("id", "v"))
    assert(Versioned.read(spark, t, Some(1L)).columns.toSeq == Seq("id", "s", "v"),
      "time travel must still show the dropped column")
    // physical bytes still on disk
    val dirs = new java.io.File(s"$t/data").listFiles().map(_.getPath)
    assert(spark.read.parquet(dirs.head).columns.contains("s"))
    // appending without the dropped column works; re-reads stay clean
    Versioned.commit(spark, t, Seq((2L, 7L)).toDF("id", "v"))
    assert(Versioned.read(spark, t).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((1L, 5L), (2L, 7L)))
    intercept[IllegalArgumentException](Versioned.dropColumn(spark, t, "nope"))
  }

  test("gated verbs refuse on mapped tables; compact materializes the feature away") {
    val t = tmpDir("colmap-gate") + "/t"
    Versioned.commit(spark, t, (1 to 10).map(i => (i.toLong, s"r$i", i.toLong))
      .toDF("id", "s", "v"))
    Versioned.renameColumn(spark, t, "v", "amount")
    val e = intercept[IllegalArgumentException](
      Versioned.deleteWhere(spark, t, $"id" === 1L))
    assert(e.getMessage.contains("does not support table features"))
    intercept[IllegalArgumentException](
      Versioned.updateWhere(spark, t, $"id" === 1L,
        Map("amount" -> org.apache.spark.sql.functions.lit(0L))))
    intercept[IllegalArgumentException](
      Versioned.statsAgg(spark, t, "amount"))
    intercept[IllegalArgumentException](Versioned.branch(spark, t, "dev"))
    // compact rewrites through the logical view: the feature drops and
    // the full verb surface returns
    Versioned.compact(spark, t, numFiles = 2)
    assert(Versioned.read(spark, t).columns.toSeq == Seq("id", "s", "amount"))
    Versioned.deleteWhere(spark, t, $"id" === 1L)
    assert(Versioned.read(spark, t).count() == 9L,
      "after the materializing rewrite the gated verbs work again")
  }

  test("renames refuse on constraint-bearing tables and colliding names") {
    val t = tmpDir("colmap-refuse") + "/t"
    Versioned.commit(spark, t, Seq((1L, 5L)).toDF("id", "v"))
    Versioned.addConstraint(spark, t, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException](
      Versioned.renameColumn(spark, t, "v", "amount"))
    assert(e.getMessage.contains("CHECK constraints"))
    Versioned.dropConstraint(spark, t, "v_pos")
    intercept[IllegalArgumentException](
      Versioned.renameColumn(spark, t, "v", "id"))
    intercept[IllegalArgumentException](
      Versioned.renameColumn(spark, t, "nope", "x"))
  }

  test("a manifest naming an unknown feature refuses at every verb") {
    val t = tmpDir("colmap-unknown") + "/t"
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // hand-forge a manifest that requires a feature this build lacks
    val p = java.nio.file.Paths.get(s"$t/_commits/000002.manifest")
    val v1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_commits/000001.manifest")), "UTF-8")
    val forged = v1.linesIterator.toSeq match {
      case op +: rest => (op +: ("feature=quantum-vacuum" +: rest)).mkString("\n")
    }
    java.nio.file.Files.write(p, forged.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Versioned.read(spark, t))
    assert(e.getMessage.contains("quantum-vacuum") &&
      e.getMessage.contains("does not support"),
      s"unknown features must refuse loudly, got: ${e.getMessage}")
    // the PRE-feature version still reads
    assert(Versioned.read(spark, t, Some(1L)).count() == 1L)
  }
}
