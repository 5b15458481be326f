package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Parsed Public-Suffix-List rule sets — the injectable table behind
 * [[RegisteredDomainPslExpr]]. The list format is the published one
 * (publicsuffix.org/list/): one rule per line, `//` comments and
 * blanks skipped, `!` marks an exception rule, a leading `*.` label
 * matches exactly one host label. Rules are held as three hash sets
 * (exception rules stored without the `!`, wildcard rules without the
 * `*.`), so matching a host costs O(labels) set probes — no joins, no
 * shuffle, no per-row regex.
 *
 * Scale shape: the real PSL is ~9k rules (~250 KB as sets) — the
 * classic broadcast-small-dimension case. Holding it INSIDE the
 * expression (the `InSet` pattern: one reference object serialized
 * with the task binary) turns the eTLD+1 rollup key into a map-only
 * column — strictly better than a broadcast join, which would still
 * pay a per-row hash probe through join machinery.
 */
final case class PslRules(exact: Set[String], wildcard: Set[String],
                          exception: Set[String]) extends Serializable {
  def size: Int = exact.size + wildcard.size + exception.size
}

object PslRules {

  /** Parse rule lines in the published PSL format. Idempotent on
    * already-parsed shapes; rules normalize to lowercase. */
  def parse(rules: Seq[String]): PslRules = {
    val cleaned = rules.iterator
      .map(_.trim.toLowerCase(Locale.ROOT))
      .filter(r => r.nonEmpty && !r.startsWith("//"))
      .toSeq
    PslRules(
      exact = cleaned.filter(r => !r.startsWith("!") && !r.startsWith("*."))
        .toSet,
      wildcard = cleaned.filter(_.startsWith("*."))
        .map(_.stripPrefix("*.")).toSet,
      exception = cleaned.filter(_.startsWith("!"))
        .map(_.stripPrefix("!")).toSet)
  }

  /**
   * The PSL algorithm (published matching rules): among all matching
   * rules the exception prevails, else the longest; no match falls to
   * the implicit `*` rule (the bare TLD is a public suffix). The
   * registered domain (eTLD+1) is the public suffix plus one host
   * label; a host that IS a public suffix (or shorter) has no
   * registrable domain → null, so curation rollups can quarantine it
   * rather than mis-bucket it.
   */
  def registeredDomain(host: UTF8String, rules: PslRules): UTF8String = {
    if (host == null) return null
    val labels = host.toString.toLowerCase(Locale.ROOT).split('.')
    val n = labels.length
    if (n == 0 || labels.exists(_.isEmpty)) return null
    var ps = 1 // the implicit * rule
    var excPs = -1
    var k = 1
    while (k <= n) {
      val suffix = labels.slice(n - k, n).mkString(".")
      if (rules.exception.contains(suffix) && k - 1 > excPs) excPs = k - 1
      if (rules.exact.contains(suffix) && k > ps) ps = k
      if (k >= 2 && k > ps &&
          rules.wildcard.contains(labels.slice(n - k + 1, n).mkString(".")))
        ps = k
      k += 1
    }
    val psLen = if (excPs >= 0) excPs else ps
    if (n <= psLen) null
    else UTF8String.fromString(labels.slice(n - psLen - 1, n).mkString("."))
  }
}

/**
 * Registered domain (eTLD+1) of a host under an INJECTED public-suffix
 * rule table — the r15-verdict ask: `Url.registeredDomain`'s 7-suffix
 * heuristic stays the zero-dependency default, and a PSL snapshot
 * (or the in-repo fixture) drops in here without code change. Codegen
 * is a static call with the parsed rules as a reference object (the
 * `InSet` pattern), so the whole lookup stays inside whole-stage
 * codegen: null in, null out; a host with no registrable domain
 * (it IS a public suffix) yields null.
 */
case class RegisteredDomainPslExpr(child: Expression, rules: PslRules)
    extends UnaryExpression {

  require(rules.size > 0, "empty PSL rule table")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"registered_domain_psl expects a string host, got $t")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registered_domain_psl"

  override def nullSafeEval(input: Any): Any =
    PslRules.registeredDomain(input.asInstanceOf[UTF8String], rules)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("pslRules", rules,
      classOf[PslRules].getName)
    nullSafeCodeGen(ctx, ev, s => s"""
      |${ev.value} = graft.functions.PslRules.registeredDomain($s, $rulesRef);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
