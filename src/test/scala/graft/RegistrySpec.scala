package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one JVM-wide SparkSession. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

/** Contract checks over the whole SparkEntry registry. */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs on sf0.001 and has a deterministic schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val n = df.count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("queries with oracles return at least one row on sf0.01 (hash checks need data)") {
    SparkEntry.queries.filterKeys(SparkEntry.oracleSql.contains).foreach {
      case (name, fn) =>
        val n = fn(spark, sf001).count()
        withClue(s"$name returned 0 rows — weak conformance signal: ") {
          assert(n > 0)
        }
    }
  }
}
