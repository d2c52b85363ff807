package graft

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.EncodingRepair

/** The mojibake table is DERIVED (UTF-8 bytes re-decoded as cp1252),
  * so these tests pin the derivation against the general ftfy
  * algorithm (re-encode and retry the decode) and the chain's
  * ordering/idempotence properties. */
class EncodingRepairSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val cp1252 = Charset.forName("windows-1252")

  /** The general algorithm: re-encode and UTF-8-decode — via cp1252,
    * or Latin-1 for the entries whose bytes strict cp1252 can't
    * represent (the lenient-decoder fallback the derivation mirrors). */
  private def ftfy(s: String, cs: Charset): String =
    new String(s.getBytes(cs), StandardCharsets.UTF_8)

  test("every table entry inverts under the general re-decode " +
      "(bad re-encoded, decoded UTF-8 == good)") {
    EncodingRepair.Repairs.foreach { case (bad, good) =>
      assert(ftfy(bad, cp1252) == good ||
        ftfy(bad, StandardCharsets.ISO_8859_1) == good,
        s"entry for '$good'")
      assert(bad != good)
    }
  }

  test("chain repairs a mis-decoded sentence exactly like the general " +
      "algorithm, and trigraphs never get half-repaired") {
    val clean = "café – “quote” … don’t — señor übel niño ça è á ó ú ö ä ‘x‘"
    val bad = EncodingRepair.misdecode(clean)
    assert(bad != clean)
    val out = Seq(bad).toDF("t")
      .select(EncodingRepair.repair(col("t")).as("r"))
      .as[String].head()
    assert(out == clean)
  }

  test("clean ASCII and already-correct accents pass through unchanged " +
      "(idempotence on repaired output)") {
    val rows = Seq("plain ascii text", "café déjà-vu – “fine”", "")
    val out = rows.toDF("t")
      .select(EncodingRepair.repair(col("t")).as("r"))
      .as[String].collect()
    assert(out.toSeq == rows)
    // applying the chain twice is the same as once
    val bad = EncodingRepair.misdecode("café … ’tis")
    val once = Seq(bad).toDF("t")
      .select(EncodingRepair.repair(col("t")).as("r")).as[String].head()
    val twice = Seq(once).toDF("t")
      .select(EncodingRepair.repair(col("t")).as("r")).as[String].head()
    assert(twice == once)
  }
}
