package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale curve for the bucketed-upsert claim (COVERAGE.md B3): the
  * eliminated target-side Exchange is O(target bytes), so the bucketed
  * merge's advantage must GROW with target size — a curve, not a point
  * (VERDICT r5 task 8).
  *
  * Method (matches the original sf0.1 measurement): target = `lineitem`
  * unioned ×K with shifted keys (genuinely distinct rows, K× the bytes),
  * stored once as a key-bucketed metastore table and once as a plain
  * parquet table; source = a fixed 20k-row update batch (half overlapping
  * keys, half new). Timed region = `Upsert.merge` → noop sink (compute
  * only, no sink variance), broadcast joins off (at warehouse scale
  * neither side broadcasts — that is the regime bucketing targets),
  * median of 5.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.UpsertScaleBench [multipliers=1,4,10] [runs=5]"
  * Prints one JSON line: {"metric":"upsert_scale","curve":[...]}.
  */
object UpsertScaleBench {

  private def timeNoop(df: => DataFrame, runs: Int): Double = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = args.headOption.getOrElse("1,4,10").split(",").map(_.trim.toInt).toSeq
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Engine.session()
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val keys = Seq("l_orderkey", "l_linenumber")
    val base = Tables(spark, sfDir, "lineitem")
    val maxKey = base.agg(max($"l_orderkey")).head().getLong(0) + 1
    // fixed-size source: 10k updates to existing keys + 10k brand-new keys
    val source = base.filter($"l_orderkey" % 601 === 0)
      .limit(10000)
      .withColumn("l_returnflag", lit("U"))
      .unionByName(
        base.filter($"l_orderkey" % 601 === 1).limit(10000)
          .withColumn("l_orderkey", -$"l_orderkey"))
      .cache()
    source.count()

    val curve = mults.map { k =>
      val target = (0 until k)
        .map(i => base.withColumn("l_orderkey", $"l_orderkey" + lit(i * maxKey)))
        .reduce(_ unionByName _)
      val tbl = s"upsert_scale_x$k"
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_b")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_p")
      target.repartition(32, keys.map(col): _*)
        .write.mode("overwrite").bucketBy(32, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*).saveAsTable(s"${tbl}_b")
      target.write.mode("overwrite").saveAsTable(s"${tbl}_p")
      val rows = spark.table(s"${tbl}_b").count()
      // warm both paths once (file listing, codegen), then time
      def bucketed = ops.Upsert.merge(spark.table(s"${tbl}_b"), source, keys)
      def plain = ops.Upsert.merge(spark.table(s"${tbl}_p"), source, keys)
      bucketed.write.format("noop").mode("overwrite").save()
      plain.write.format("noop").mode("overwrite").save()
      val tb = timeNoop(bucketed, runs)
      val tp = timeNoop(plain, runs)
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_b")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_p")
      (k, rows, tb, tp)
    }

    val entries = curve.map { case (k, rows, tb, tp) =>
      s"""{"mult":$k,"target_rows":$rows,"bucketed_sec":$tb,""" +
        s""""unbucketed_sec":$tp,"speedup":${tp / tb}}"""
    }.mkString("[", ",", "]")
    // Double.toString is locale-safe (Bench.scala's JSON contract)
    println(s"""{"metric":"upsert_scale","sf_dir":"$sfDir","runs":$runs,"curve":$entries}""")
    spark.stop()
  }
}
