package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for the LLM-pipeline surface: marker-based
 * language ID, quality bucketing, BPE-ish token counting, and a rolling
 * document fingerprint. Every function here is a pure Column expression
 * (no UDFs), and every formula is deliberately expressible 1:1 in the
 * DuckDB oracle SQL so the operators are hash-verified end-to-end —
 * [[ExtQueries]] generates both sides from the same constants.
 */
object TextAnalysis {

  /** Language marker words (space-delimited forms so they only match
    * whole words); zh markers are CJK characters. Tiny on purpose — the
    * heuristic is the documented scalable shape (count marker hits, take
    * the argmax), not a linguistics claim. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "de" -> Seq(" der ", " die ", " und "),
    "zh" -> Seq("的", "是", "在"))

  /** Occurrence count of a literal marker: (len - len(remove(marker))) /
    * len(marker). Same expression shape as the oracle's `replace`. */
  def occurrences(text: Column, marker: String): Column =
    (length(text) - length(call_function("replace", text, lit(marker), lit("")))) /
      marker.length

  private def score(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(text, m)).reduce(_ + _)

  /** Predicted language: argmax of marker scores with fixed precedence
    * (en > fr > es > de > zh on ties, so all-zero scores yield "en"). */
  def predictLang(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> score(text, ms) }
    def gmax(cols: Seq[Column]): Column =
      if (cols.size == 1) cols.head else greatest(cols: _*)
    def chain(rest: List[(String, Column)]): Column = rest match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, s) :: tail =>
        when(s >= gmax(tail.map(_._2)), lang).otherwise(chain(tail))
      case Nil => lit(null)
    }
    chain(scores.toList)
  }

  /** Whitespace word count (single-space-delimited text). */
  def wordCount(text: Column): Column =
    length(text) - length(translate(text, " ", "")) + 1

  /** Length-based quality bucket — the scalable scan-only shape of a
    * quality scorer (ratio features bucketed by thresholds). */
  def qualityBucket(text: Column): Column = {
    val wc = wordCount(text)
    when(wc < 40, "short").when(wc < 70, "medium").otherwise("long")
  }

  /** BPE-ish token count: letter runs, digit runs, and single non-space
    * symbols each count as one token. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TokenPattern), lit(0))).cast("long")

  /** Rolling polynomial fingerprint over words: fold of
    * h → (h*31 + ascii(first char) + len(word)) mod 1e9+7. Order-sensitive
    * (unlike a bag-of-words hash) and O(words) per doc. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, " "), w => (ascii(w) + length(w)).cast("long")),
      lit(0L),
      (h, x) => (h * 31 + x) % 1000000007L)
}
