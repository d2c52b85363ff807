package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair — the ftfy-shaped cleanup pass every web-scale text
  * pipeline runs (Dolma/OLMo, C4): text that went through a UTF-8 →
  * Windows-1252 mis-decode ("café" → "cafÃ©", "don’t" → "donâ€™t")
  * is mapped back to the intended characters.
  *
  * The general ftfy algorithm re-encodes each string and retries the
  * decode; this engine's form is the BOUNDED-TABLE variant: an ordered
  * literal-replace chain whose bad forms are DERIVED, not hand-typed —
  * each is `new String(good.getBytes(UTF_8), cp1252)`, the actual
  * mis-decode — so the chain agrees with the general algorithm
  * wherever the table applies (spec re-derives and round-trips every
  * entry). Longest bad forms first: the 3-char cp1252 punctuation
  * forms share the "â€" prefix, and a shorter rule firing first would
  * half-repair them. Widening the character list changes data, not
  * the plan.
  *
  * Scale shape: a pure projection (chained literal `replace` inside
  * whole-stage codegen, linear in bytes, no shuffle) — rides the
  * ingest scan like the other text-cleaning gates. Declarative on
  * purpose: engine-portable and oracle-checkable, where a
  * charset-round-trip UDF would be neither.
  */
object EncodingRepair {

  /** The repaired characters: common cp1252 punctuation + Latin
    * letters — the entries responsible for the overwhelming bulk of
    * real-corpus mojibake. */
  val Targets: Seq[String] = Seq(
    "‘", "’", "“", "”",   // ‘ ’ “ ”
    "–", "—", "…",             // – — …
    "é", "è", "á", "ó", "ú", "ü", "ö", "ä", "ñ", "ç")

  private def misdecodeVia(good: String,
      cs: java.nio.charset.Charset): String =
    new String(good.getBytes(java.nio.charset.StandardCharsets.UTF_8), cs)

  /** What `good` looks like after the UTF-8 → cp1252 mis-decode
    * (also the fixture-planting seam for the conformance entry).
    * Bytes cp1252 leaves UNMAPPED (0x81/8D/8F/90/9D — e.g. the last
    * byte of ”) decode to U+FFFD under the strict table, which is
    * unrecoverable; lenient real-world decoders fall back to the
    * Latin-1 C1 controls there, so the derivation does too — that IS
    * the observed mojibake form for those characters. */
  def misdecode(good: String): String = {
    val strict = misdecodeVia(good,
      java.nio.charset.Charset.forName("windows-1252"))
    if (strict.indexOf('�') < 0) strict
    else misdecodeVia(good, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** (bad, good), longest bad first (see object doc). BOTH mojibake
    * dialects are derived per target — the cp1252 mis-decode (€-range
    * punctuation) and the Latin-1 one (C1 controls); they coincide for
    * the ≥0xA0 accented letters, and `distinct` collapses those. */
  val Repairs: Seq[(String, String)] =
    Targets.flatMap { g =>
      val viaCp = misdecodeVia(g,
        java.nio.charset.Charset.forName("windows-1252"))
      val viaLatin =
        misdecodeVia(g, java.nio.charset.StandardCharsets.ISO_8859_1)
      (if (viaCp.indexOf('�') < 0) Seq(viaCp, viaLatin)
       else Seq(viaLatin)).distinct.map(_ -> g)
    }.sortBy { case (bad, good) => (-bad.length, good, bad) }

  /** The repaired text: ordered literal-replace chain. */
  def repair(text: Column): Column =
    Repairs.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** DuckDB rendering of the same chain (replace(), same order) — one
    * derived table, two renderings. The mis-decoded forms embed as
    * raw UTF-8 in the SQL text. */
  def repairSql(inner: String): String =
    Repairs.foldLeft(inner) { case (acc, (bad, good)) =>
      s"replace($acc, '$bad', '$good')"
    }
}
