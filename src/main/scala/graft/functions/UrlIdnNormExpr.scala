package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * IDN + percent-encoding normalization for URL dedup keys — the two
 * encoding twins the plain string canonicalizer cannot fold
 * (r15-verdict "What's missing" #3): a punycode host
 * (`xn--mnchen-3ya.de`) and its Unicode form are the SAME site, and
 * `/p/%61bc` / `/p/abc` / `/p/%3f` vs `/p/%3F` are the same resource,
 * but they hash to different URL-level dedup keys and under-merge.
 *
 * Normalization applied (RFC 3986 §6.2.2 equivalence, JDK-only):
 *  - host labels decode via `java.net.IDN.toUnicode` (RFC 3490; a
 *    non-IDN host is returned unchanged, so the dominant ASCII corpus
 *    slice costs one prefix scan); a malformed xn-- label keeps its
 *    original bytes — tolerate, don't abort (the try_parse_url rule);
 *  - percent-escapes of UNRESERVED characters (ALPHA / DIGIT /
 *    `-._~`) decode to the bare character;
 *  - remaining percent-escapes uppercase their hex digits
 *    (`%3f` → `%3F`), the RFC's canonical form;
 *  - everything else passes through byte-for-byte (reserved
 *    characters stay encoded — decoding them would CHANGE the URL's
 *    structure, not its spelling).
 *
 * One pass per row inside whole-stage codegen (static call, the
 * UnicodeNormExpr pattern). Applied AFTER [[graft.operators.Url.canonicalizeUrl]]
 * in `canonicalizeUrlExt` so the fragment/tracking strip sees the raw
 * form and this pass sees a lowercased scheme+host.
 */
case class UrlIdnNormExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"url_idn_norm expects a string url, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "url_idn_norm"

  override def nullSafeEval(input: Any): Any =
    UrlIdnNormExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UrlIdnNormExpr.normalize($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UrlIdnNormExpr {

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** Percent-escape normalization: decode unreserved, uppercase the
    * rest, pass malformed `%`s through untouched. */
  private def percentNorm(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Host IDN decode, tolerant: only attempted when an `xn--` label is
    * present; any decode failure keeps the original host (a malformed
    * URL must surface for filtering, not abort a 100-TB job). The
    * userinfo/port slices of the authority pass through unchanged. */
  private def idnHost(authority: String): String = {
    val at = authority.lastIndexOf('@')
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val hasPort = colon >= 0 && colon < hostPort.length - 1 &&
      hostPort.substring(colon + 1).forall(_.isDigit) &&
      colon + 1 < hostPort.length
    val host = if (hasPort) hostPort.substring(0, colon) else hostPort
    if (!host.contains("xn--")) return authority
    val decoded =
      try java.net.IDN.toUnicode(host)
      catch { case _: RuntimeException => host }
    authority.substring(0, at + 1) + decoded +
      (if (hasPort) hostPort.substring(colon) else "")
  }

  /** Static kernel (called from generated code). */
  def normalize(url: UTF8String): UTF8String = {
    val s = url.toString
    val schemeEnd = s.indexOf("://")
    val out =
      if (schemeEnd < 0) percentNorm(s)
      else {
        val authStart = schemeEnd + 3
        var authEnd = authStart
        while (authEnd < s.length && s.charAt(authEnd) != '/' &&
          s.charAt(authEnd) != '?' && s.charAt(authEnd) != '#') authEnd += 1
        s.substring(0, authStart) +
          idnHost(s.substring(authStart, authEnd)) +
          percentNorm(s.substring(authEnd))
      }
    if (out == s) url else UTF8String.fromString(out)
  }
}
