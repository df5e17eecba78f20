package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for unit specs: small core/partition counts
  * (specs test semantics, not throughput) but the same canonical config
  * knobs as `Engine.builder` so behavior matches the driver contract.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Derives from Engine.builder so the canonical knobs AND the injected
  // native functions (GraftExtensions) are present, with small core /
  // partition counts (specs test semantics, not throughput).
  lazy val spark: SparkSession = Engine.builder(cores = "4")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (Test/fork := true gives
    // one JVM per test run) — do not stop it per-suite.
    super.afterAll()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
