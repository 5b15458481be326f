package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection / redaction — the scrub stage every training-data
 * pipeline runs before a corpus leaves curation: find emails, IPv4
 * addresses, phone numbers, SSN-shaped ids and 16-digit card numbers,
 * count them per document, replace them with typed placeholders, and
 * (for card numbers) separate format hits from Luhn-valid hits so the
 * scrubber's precision is measurable, not assumed.
 *
 * Engine-parity rules (the q68/q266 regex discipline, extended):
 * every pattern stays inside the Java-regex ∩ RE2 common subset —
 * `\b`, explicit character classes, bounded repetition, non-capturing
 * groups; no lookaround (RE2 has none), no inline flags. Replacement
 * placeholders (`<EMAIL>` etc.) contain no word characters adjacent
 * to digits, so redaction is idempotent and one class's placeholder
 * can never create another class's match; both engines apply the same
 * class order. The Luhn check is generated as the same 16-term
 * branch-free sum on both sides ([[luhnValid]] / the oracle's
 * generated SQL) — no loops, no UDF, one integer modulus at the end.
 *
 * Scale shape: detection and redaction are MAP-ONLY column
 * expressions over the text column (regexp_count / regexp_replace —
 * codegen'd built-ins, zero shuffle, zero UDF); the scorecard is one
 * hash aggregation on the language key. Per-row cost is O(|text|)
 * regex scans — the same constant at sf0.001 and at 100 TB, so the
 * family rides the flat per-byte band every other map-only quality
 * metric in this repo measures ([[TextAnalysis.qualityScore]],
 * ScaleBench `pii_scan`).
 *
 * The test corpus carries no real PII, so oracle entries plant
 * deterministic synthetic pieces ([[syntheticPiiText]] — md5
 * arithmetic the DuckDB twin reproduces verbatim, the
 * [[Url.syntheticUrl]] pattern); a real corpus passes its own text
 * column to the same operators.
 */
object Pii {

  /** Email, explicit-class form (case-sensitive on purpose: the
    * planted corpus is lowercase; add both cases to the class, not an
    * inline flag, if a corpus needs it — RE2 and Java agree on
    * classes, inline-flag scoping differs). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** One decimal octet, 0–255, no leading-zero forms beyond plain 0. */
  private val Octet = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

  /** Dotted-quad IPv4 with per-octet range validation — `999.88.77.66`
    * is NOT a match (the octet alternation cannot absorb 999 and the
    * quad then comes up one group short). */
  val Ipv4Re: String = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"

  /** NANP-shaped phone, dashed groups. Disjoint from [[SsnRe]] by the
    * middle-group width (3 vs 2) — neither can match inside the other
    * (spec-pinned). */
  val PhoneRe: String = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** SSN-shaped id: 3-2-4 dashed digit groups. */
  val SsnRe: String = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** 16 contiguous digits — the FORMAT gate for card numbers; compose
    * with [[luhnValid]] for the precision gate. */
  val CcRe: String = "\\b[0-9]{16}\\b"

  /** (class name, pattern, placeholder) in application order. Email
    * runs first (its local part may contain digit runs the numeric
    * classes would otherwise eat), then card/SSN/phone (mutually
    * disjoint), IPv4 last. The DuckDB twin must apply the same order
    * with the 'g' flag ([[ExtQueries]] builds it from this seq). */
  val Classes: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("cc", CcRe, "<CC>"),
    ("ssn", SsnRe, "<SSN>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ipv4", Ipv4Re, "<IP>"))

  /** Per-class non-overlapping match counts as a struct column
    * `(n_email, n_cc, n_ssn, n_phone, n_ipv4)` — one codegen'd
    * regexp_count per class, map-only. */
  def piiCounts(text: Column): Column =
    struct(Classes.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).cast("long").as(s"n_$name")
    }: _*)

  /** Total PII hits across all classes (the admission-gate scalar). */
  def piiHits(text: Column): Column =
    Classes.map { case (_, pat, _) =>
      regexp_count(text, lit(pat)).cast("long")
    }.reduce(_ + _)

  /** Replace every match of every class with its typed placeholder,
    * in [[Classes]] order. Idempotent: placeholders contain no
    * pattern-matchable text. */
  def redactPii(text: Column): Column =
    Classes.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Luhn checksum validity for a 16-digit string: positions 1,3,…,15
    * (1-indexed from the LEFT of a fixed even-length string) are
    * doubled with the >9 ⇒ −9 fold; valid iff the sum ≡ 0 (mod 10).
    * Generated as 16 branch terms — no loop, no array, stays inside
    * whole-stage codegen. NULL-safe: a null/short input yields null
    * (cast of '' → null propagates through the sum). */
  def luhnValid(cc16: Column): Column = {
    val sum = (1 to 16).map { i =>
      val d = substring(cc16, i, 1).cast("int")
      if (i % 2 == 1) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2) else d
    }.reduce(_ + _)
    (sum % 10) === 0
  }

  /** The same 16-term Luhn sum as DuckDB SQL over a column expression
    * — kept HERE, next to [[luhnValid]], so the two engines' arithmetic
    * cannot drift apart in separate files. */
  def luhnValidSql(ccExpr: String): String = {
    val terms = (1 to 16).map { i =>
      val d = s"CAST(substr($ccExpr, $i, 1) AS INTEGER)"
      if (i % 2 == 1) s"(CASE WHEN 2*$d > 9 THEN 2*$d - 9 ELSE 2*$d END)"
      else d
    }
    s"((${terms.mkString(" + ")}) % 10 = 0)"
  }

  // -- deterministic synthetic PII (oracle corpus) ---------------------

  /** md5-derived 16-bit hash pair for a document id — the same
    * derivation the DuckDB CTE builds with concat('0x',…)::UBIGINT. */
  private def hashes(docId: Column): (Column, Column) = {
    val md = md5(docId.cast("string"))
    (conv(substring(md, 1, 4), 16, 10).cast("long"),
      conv(substring(md, 5, 4), 16, 10).cast("long"))
  }

  /** Deterministic synthetic-PII pieces appended to a document's text:
    * an email for half the docs, a VALID IPv4 for a third, an
    * out-of-range `999.…` non-IP for another third (plants the octet
    * validation's negative case in-corpus), a phone for half, an SSN
    * for a third, and a 16-digit card number for every doc (the q277
    * Luhn census needs full coverage; validity falls where the md5
    * arithmetic puts it, ~10%). All group widths are pinned by +base
    * offsets so string rendering is fixed-width without padding. */
  def syntheticPiiText(docId: Column, text: Column): Column = {
    val (h, h2) = hashes(docId)
    def s(c: Column): Column = c.cast("string")
    val email = concat(lit("user"), s(pmod(docId, lit(1000))),
      lit("@mail"), s(pmod(h, lit(5))), lit(".example.com"))
    val ipValid = concat(s(pmod(h, lit(200))), lit("."),
      s(pmod(h2, lit(256))), lit("."), s(pmod(docId, lit(256))),
      lit("."), s(pmod(h, lit(254)) + 1))
    val ipBad = concat(lit("999."), s(pmod(h, lit(90)) + 10), lit("."),
      s(pmod(h2, lit(90)) + 10), lit(".1"))
    val phone = concat(lit("555-"), s(pmod(h, lit(900)) + 100),
      lit("-"), s(pmod(docId, lit(9000)) + 1000))
    val ssn = concat(s(pmod(h2, lit(900)) + 100), lit("-"),
      s(pmod(h, lit(89)) + 10), lit("-"), s(pmod(h2, lit(9000)) + 1000))
    val cc = concat(lit("4"), lpad(s(pmod(h, lit(100000))), 5, "0"),
      lpad(s(pmod(h2, lit(100000))), 5, "0"),
      lpad(s(pmod(docId, lit(100000))), 5, "0"))
    concat(text,
      when(pmod(h, lit(2)) === 0, concat(lit(" "), email)).otherwise(lit("")),
      when(pmod(h, lit(3)) === 0, concat(lit(" ip "), ipValid))
        .when(pmod(h, lit(3)) === 1, concat(lit(" ip "), ipBad))
        .otherwise(lit("")),
      when(pmod(h2, lit(2)) === 0, concat(lit(" tel "), phone)).otherwise(lit("")),
      when(pmod(h2, lit(3)) === 0, concat(lit(" id "), ssn)).otherwise(lit("")),
      lit(" card "), cc, lit(" end"))
  }
}
