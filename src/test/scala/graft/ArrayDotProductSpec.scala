package graft

import org.apache.spark.sql.functions._

/** Native `graft_dot` expression: bit-for-bit parity with the built-in
  * higher-order-function composition it replaces, null semantics, and the
  * SQL registration path (GraftExtensions).
  */
class ArrayDotProductSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, v) => acc + v)

  test("graft_dot matches the zip_with/aggregate fold bit-for-bit") {
    // Values chosen to be order-sensitive under double addition: summing in
    // a different order than the ascending-index fold changes the bits.
    val rows = (1 to 200).map { i =>
      (Array.tabulate(64)(d => math.sin(i * 64 + d) * 1e3),
       Array.tabulate(64)(d => math.cos(i * 64 + d) / 7))
    }
    val df = rows.toDF("a", "b")
    val diff = df
      .select((call_function("graft_dot", $"a", $"b") - hofDot($"a", $"b")).as("d"))
      .filter($"d" =!= 0d)
    assert(diff.count() === 0)
  }

  test("null array, null element, or length mismatch yields null (zip_with parity)") {
    val out = spark.sql(
      """SELECT
        |  graft_dot(CAST(NULL AS array<double>), array(1d, 2d)) AS null_arr,
        |  graft_dot(array(1d, CAST(NULL AS double)), array(1d, 2d)) AS null_elem,
        |  graft_dot(array(1d, 2d, 3d), array(10d, 10d)) AS len_mismatch
        |""".stripMargin).collect()(0)
    assert(out.isNullAt(0))
    assert(out.isNullAt(1))
    assert(out.isNullAt(2), "length mismatch must be NULL, not a silent prefix product")
  }

  test("registered in SQL and survives codegen and interpreted paths") {
    val df = (1 to 50).map(i => Array.tabulate(8)(d => (i + d).toDouble)).toDF("v")
    df.createOrReplaceTempView("vecs")
    val sqlSum = spark.sql("SELECT SUM(graft_dot(v, v)) AS s FROM vecs").collect()(0).getDouble(0)
    val apiSum = df.select(sum(call_function("graft_dot", $"v", $"v"))).collect()(0).getDouble(0)
    assert(sqlSum === apiSum)
  }
}
