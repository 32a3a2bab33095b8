package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide SparkContext),
  * built through [[Sessions.applyCommon]] so tests run the exact
  * semantics-bearing config Verify and Bench run.
  */
object TestSession {
  lazy val spark: SparkSession = Sessions.finish(
    Sessions.applyCommon(SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate(),
    "ERROR")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
