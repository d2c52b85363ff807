package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcSink

/** Property test for the JDBC merge sink: for ANY sequence of batches
  * of (key, payload, version) rows — duplicate keys within and across
  * batches, any delivery order, including replayed older batches — the
  * table must equal the fold of version-max merges over all rows seen.
  * This is the full last-write-wins contract the versionCol guard
  * promises, checked against a trivial in-memory model.
  */
class JdbcPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftprop;create=true"

  private def freshTable(name: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $name") catch { case _: Exception => () }
      st.execute(s"CREATE TABLE $name (k VARCHAR(16) PRIMARY KEY, " +
        "payload INT, ver BIGINT)")
      st.close()
    } finally conn.close()
  }

  private def readBack(name: String): Map[String, (Int, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT * FROM $name")
      val b = Map.newBuilder[String, (Int, Long)]
      while (rs.next()) b += rs.getString(1) -> ((rs.getInt(2), rs.getLong(3)))
      b.result()
    } finally conn.close()
  }

  // a batch: 0 to 6 rows over a 4-key pool (empty batches included —
  // the sink must no-op on them); versions unique per run so the
  // expected winner is unambiguous (assigned globally below)
  private val batchShape: Gen[List[(String, Int)]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.oneOf("k1", "k2", "k3", "k4"), Gen.choose(0, 999))))

  test("upsert with versionCol equals the version-max fold for any batch sequence") {
    val scenarios: Gen[List[List[(String, Int)]]] =
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, batchShape))
    val prop = Prop.forAll(scenarios) { raw =>
      // assign globally unique, batch-ordered versions, then REPLAY the
      // batches in reverse order too — the guard must make the final
      // state depend only on versions, not delivery order
      var v = 0L
      val batches = raw.map(_.map { case (k, p) => v += 1; (k, p, v) })
      freshTable("prop_sink")
      (batches ++ batches.reverse).foreach { b =>
        if (b.nonEmpty) {
          val df = b.toDF("k", "payload", "ver")
          JdbcSink.upsert(df, "k", Seq(desc("ver")), url, "prop_sink",
            versionCol = Some("ver"))
        }
      }
      val expected = batches.flatten
        .groupBy(_._1)
        .map { case (k, rows) =>
          val win = rows.maxBy(_._3); k -> ((win._2, win._3)) }
      readBack("prop_sink") == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
