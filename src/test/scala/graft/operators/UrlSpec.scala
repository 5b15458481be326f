package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL/domain curation contract ([[Url]]): parse_url extraction on
  * hand-built URLs (ports, subdomains, absent queries), the
  * registered-domain heuristic's branches (2-label, 3-label ccTLD,
  * bare host, NULL), the per-domain cap's exact-k + determinism, and
  * the dup-audit's hand-checkable counts. */
class UrlSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("urlParts: host/path/q-param across ports, subdomains, no-query") {
    val df = Seq(
      (1L, "https://www.site3.co.uk:8080/p/5?q=en"),
      (2L, "https://site1.com/p/7"),
      (3L, "https://blog.site2.edu.au/a/b?x=1&q=de&y=2"),
      (4L, "not a url")).toDF("id", "url")
    val out = Url.urlParts(df, col("url")).orderBy("id")
      .select("host", "url_path", "q_param", "reg_domain")
      .collect()
    assert(out(0).getString(0) == "www.site3.co.uk") // port stripped
    assert(out(0).getString(1) == "/p/5" && out(0).getString(2) == "en")
    assert(out(0).getString(3) == "site3.co.uk")
    assert(out(1).getString(0) == "site1.com" && out(1).getString(2) == null)
    assert(out(1).getString(3) == "site1.com")
    assert(out(2).getString(2) == "de") // q among other params
    assert(out(2).getString(3) == "site2.edu.au")
    assert(out(3).getString(0) == null && out(3).getString(3) == null)
  }

  test("registeredDomain: heuristic branches incl. bare host and deep subdomains") {
    val df = Seq(
      ("a.b.site9.com", "site9.com"),      // deep subdomain, gTLD
      ("x.y.site9.ac.uk", "site9.ac.uk"),  // deep subdomain, ccTLD 2LD
      ("site9.gov.br", "site9.gov.br"),    // gov under 2-letter ccTLD
      ("site9.co.com", "site9.co.com"),    // 'co' NOT under 2-letter tld? com has 3 letters -> 2 labels... see assert
      ("localhost", "localhost"),          // bare label passes through
      ("site9.io", "site9.io")
    ).toDF("host", "expected")
    // 'site9.co.com': tld 'com' has length 3, so the 3-label branch
    // must NOT fire — registered domain is 'co.com'
    val out = df.withColumn("got", Url.registeredDomain(col("host")))
      .collect()
    out.foreach { r =>
      val host = r.getString(0)
      val exp = if (host == "site9.co.com") "co.com" else r.getString(1)
      assert(r.getString(2) == exp, s"$host -> ${r.getString(2)} != $exp")
    }
  }

  test("perDomainCap: exact k per domain, content-keyed determinism") {
    val docs = (0L until 100L).map(i => (i, s"site${i % 3}.com", s"t$i"))
      .toDF("doc_id", "reg_domain", "text")
    val kept = Url.perDomainCap(docs, "doc_id", 10)
    val sizes = kept.groupBy("reg_domain").count().collect()
      .map(_.getLong(1))
    assert(sizes.length == 3 && sizes.forall(_ == 10))
    // reproducible across a different partitioning
    val kept2 = Url.perDomainCap(docs.repartition(7), "doc_id", 10)
    assert(kept.select("doc_id").orderBy("doc_id").collect()
      .sameElements(kept2.select("doc_id").orderBy("doc_id").collect()))
    // a group smaller than k keeps everything
    val small = Url.perDomainCap(docs.filter(col("doc_id") < 5), "doc_id", 10)
    assert(small.count() == 5)
  }

  test("domainDupStats: hand-checkable exact and near counts") {
    val docs = Seq(
      (1L, "d1.com", "the quick brown fox jumps over the lazy dog"),
      (2L, "d1.com", "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "d1.com", "the quick brown fox jumps over the lazy cat"), // near dup of 1/2
      (4L, "d2.com", "the quick brown fox jumps over the lazy dog"), // exact text, OTHER domain
      (5L, "d2.com", "completely different words entirely here now")
    ).toDF("doc_id", "reg_domain", "text")
    val out = Url.domainDupStats(docs, "doc_id", "text", 0.6)
      .orderBy("reg_domain").collect()
    // d1: 3 docs, one exact surplus (2 of the identical text), near
    // pairs within d1 at >= 0.6: (1,3),(2,3) [(1,2) too: jac 1.0] = 3
    assert(out(0).getString(0) == "d1.com")
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 1)
    assert(out(0).getDouble(3) == 0.3333)
    assert(out(0).getLong(4) == 3)
    // d2: no within-domain duplication (doc 4's twin lives in d1)
    assert(out(1).getString(0) == "d2.com")
    assert(out(1).getLong(2) == 0 && out(1).getLong(4) == 0)
  }

  test("urlParts + canonicalizeUrl are map-only: zero exchanges in the executed plan") {
    val docs = (0L until 100L).map(i => (i, "en")).toDF("doc_id", "lang")
    val plan = Url.urlParts(
        docs.withColumn("url", Url.syntheticUrl(col("doc_id"), col("lang"))),
        col("url"))
      .withColumn("canon", Url.canonicalizeUrl(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"parse path shuffled:\n$plan")
  }

  test("canonicalizeUrl: fragment, tracking params, :443, host case — path case preserved") {
    val cases = Seq(
      ("https://WWW.Site3.CO.UK/P/5?q=en", "https://www.site3.co.uk/P/5?q=en"),
      ("https://a.com:443/p/7", "https://a.com/p/7"),
      ("https://a.com:8080/p?q=en&utm_source=n&utm_medium=e",
        "https://a.com:8080/p?q=en"), // non-default port survives
      ("https://a.io/p?utm_source=n&utm_medium=e", "https://a.io/p"),
      ("https://a.de/p/1?q=fr#sec2", "https://a.de/p/1?q=fr"),
      ("https://a.de/p/1#sec2", "https://a.de/p/1"),
      ("https://a.de/p?fbclid=xyz&q=de&gclid=2", "https://a.de/p?q=de"),
      // HOSTILE names — params merely CONTAINING a tracking name must
      // survive (the strip is anchored to the [?&] parameter boundary)
      ("https://a.de/p?myfbclid=x", "https://a.de/p?myfbclid=x"),
      ("https://a.de/p?xutm_source=y&q=de", "https://a.de/p?xutm_source=y&q=de"),
      ("https://a.de/p?myfbclid=x&utm_source=n", "https://a.de/p?myfbclid=x"),
      // consecutive tracking params straddling the ? boundary collapse
      // to a clean no-query URL, not a dangling '?&'
      ("https://a.de/p?utm_a=1&utm_b=2&utm_c=3", "https://a.de/p"),
      ("https://a.de/p?fbclid=&q=de", "https://a.de/p?q=de"),
      ("https://a.de/clean", "https://a.de/clean"))
    val out = cases.toDF("u", "want")
      .withColumn("got", Url.canonicalizeUrl(col("u"))).collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"${r.getString(0)} -> ${r.getString(2)} != ${r.getString(1)}"))
  }

  test("canonicalizeUrl is idempotent; registeredDomain is a 2-3 label host suffix") {
    // the whole synthetic corpus, clean AND dirty forms — canon of a
    // canonical URL must be a fixpoint, or repeated pipeline passes
    // would keep rewriting keys
    val docs = (0L until 500L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val urls = docs.select(
        Url.syntheticUrl(col("doc_id"), col("lang")).as("u"))
      .union(docs.select(
        Url.syntheticDirtyUrl(col("doc_id"), col("lang")).as("u")))
    val c = urls.withColumn("c1", Url.canonicalizeUrl(col("u")))
      .withColumn("c2", Url.canonicalizeUrl(col("c1")))
    assert(c.filter(col("c1") =!= col("c2")).count() == 0)
    // registered domain: always a dot-suffix of the (lowercased) host
    // with exactly 2 or 3 labels
    val rd = Url.urlParts(c.select(col("c1").as("u")), col("u"))
      .select("host", "reg_domain")
    assert(rd.filter(!col("host").endsWith(col("reg_domain"))).count() == 0)
    assert(rd.filter(!org.apache.spark.sql.functions.size(
      split(col("reg_domain"), "\\.")).isin(2, 3)).count() == 0)
  }

  test("blocklistFilter: banned domains vanish via a BROADCAST anti-join") {
    val docs = (0L until 200L).map(i => (i, s"site${i % 5}.com"))
      .toDF("doc_id", "reg_domain")
    val blocked = Seq("site1.com", "site3.com", "absent.org")
      .toDF("reg_domain")
    val out = Url.blocklistFilter(docs, blocked)
    assert(out.count() == 120)
    assert(out.filter(col("reg_domain").isin("site1.com", "site3.com"))
      .count() == 0)
    // the gate must stay map-side: a blocklist is domain-cardinality-
    // bounded, so the anti-join broadcasts — no corpus shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist gate shuffled the corpus:\n$plan")
  }

  test("perDomainCapBy: per-domain quotas with default fallback, deterministic winners") {
    val docs = (0L until 90L).map(i => (i, s"site${i % 3}.com", s"t$i"))
      .toDF("doc_id", "reg_domain", "text")
    val caps = Seq(("site0.com", 5L), ("site1.com", 40L))
      .toDF("reg_domain", "cap")
    val kept = Url.perDomainCapBy(docs, "doc_id", caps, defaultCap = 10L)
    val sizes = kept.groupBy("reg_domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // site0 capped at 5; site1's 40 exceeds its 30 docs (keeps all);
    // site2 absent from the table -> default 10
    assert(sizes == Map("site0.com" -> 5L, "site1.com" -> 30L,
      "site2.com" -> 10L))
    // same winners across a different partitioning
    val kept2 = Url.perDomainCapBy(docs.repartition(7), "doc_id", caps, 10L)
    assert(kept.select("doc_id").orderBy("doc_id").collect()
      .sameElements(kept2.select("doc_id").orderBy("doc_id").collect()))
    // the flat-cap operator is the constant-quota special case
    val flat = Url.perDomainCap(docs, "doc_id", 10)
    val flatBy = Url.perDomainCapBy(docs, "doc_id",
      caps.limit(0), defaultCap = 10L)
    assert(flat.select("doc_id").orderBy("doc_id").collect()
      .sameElements(flatBy.select("doc_id").orderBy("doc_id").collect()))
  }

  test("urlParts PSL overload: reg_domain comes from the injected rules") {
    val df = Seq((1L, "https://a.example.com.br/p"),
      (2L, "https://x.y.site.co.jp/q"),
      (3L, "https://deep.whatever.github.io/r")).toDF("id", "url")
    val out = Url.urlParts(df, col("url"), Url.PslFixture)
      .orderBy("id").select("reg_domain").collect().map(_.getString(0))
    assert(out.toSeq == Seq("example.com.br", "site.co.jp",
      "whatever.github.io"))
  }

  test("extractUrls: prose/HTML/markdown delimiters terminate; no match yields empty array") {
    val cases = Seq(
      ("see https://a.com/p?x=1 and http://b.org/q.",
        Seq("https://a.com/p?x=1", "http://b.org/q.")),
      ("""<a href="https://c.net/x">link</a>""", Seq("https://c.net/x")),
      ("[md](https://d.io/y) tail", Seq("https://d.io/y)")),
      ("no links here", Seq()),
      ("ftp://not.matched and httpsx://also.not", Seq()))
    val out = cases.toDF("t", "want")
      .withColumn("got", Url.extractUrls(col("t"))).collect()
    out.foreach(r => assert(r.getSeq[String](2) == r.getSeq[String](1),
      s"${r.getString(0)} -> ${r.getSeq[String](2)}"))
  }

  test("robotsGate: per-domain path-prefix disallows, broadcast, rule-less domains pass") {
    val docs = Seq(
      (1L, "a.com", "/p/1"), (2L, "a.com", "/p/12"), // both under /p/1
      (3L, "a.com", "/p/2"),
      (4L, "b.org", "/x"), (5L, "b.org", "/y"),      // '/' bans all of b.org
      (6L, "c.net", "/p/1")                          // no c.net rule: passes
    ).toDF("doc_id", "reg_domain", "url_path")
    val rules = Seq(("a.com", "/p/1"), ("b.org", "/"))
      .toDF("reg_domain", "path_prefix")
    val out = Url.robotsGate(docs, rules)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 6L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast") && plan.contains("LeftAnti"),
      s"robots gate shuffled the corpus:\n$plan")
  }

  test("canonicalizeUrlExt: IDN hosts and percent-escapes fold to one key; idempotent") {
    val cases = Seq(
      // punycode host decodes; ascii hosts untouched
      ("https://xn--mnchen-3ya.example.de/p/1", "https://m\u00FCnchen.example.de/p/1"),
      ("https://a.xn--bcher-kva.de:8080/p", "https://a.b\u00FCcher.de:8080/p"),
      ("https://plain.example.com/p", "https://plain.example.com/p"),
      // unreserved escapes decode, case-insensitively
      ("https://a.com/p/%61%62%63", "https://a.com/p/abc"),
      ("https://a.com/p/%7Eu%2Dx", "https://a.com/p/~u-x"),
      // reserved escapes stay encoded, hex uppercased
      ("https://a.com/p?x=%3fy%2f", "https://a.com/p?x=%3Fy%2F"),
      // malformed % passes through
      ("https://a.com/p/%zz%4", "https://a.com/p/%zz%4"),
      // malformed xn-- label keeps its original bytes (tolerate)
      ("https://xn--!!!bad.example.com/p", "https://xn--!!!bad.example.com/p"),
      // composes with the string canonicalizer (fragment + tracking)
      ("https://XN--CAF-DMA.COM/p?utm_source=n&q=%64#f",
        "https://caf\u00E9.com/p?q=d"))
    val out = cases.toDF("u", "want")
      .withColumn("got", Url.canonicalizeUrlExt(col("u"))).collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"${r.getString(0)} -> ${r.getString(2)} != ${r.getString(1)}"))
    // idempotence over the whole case set
    val c2 = cases.toDF("u", "want")
      .withColumn("c1", Url.canonicalizeUrlExt(col("u")))
      .withColumn("c2", Url.canonicalizeUrlExt(col("c1")))
    assert(c2.filter(col("c1") =!= col("c2")).count() == 0)
  }

  test("registeredDomainPsl: every published rule shape over the fixture") {
    // cases follow the PSL's published matching rules (longest match,
    // exceptions prevail, implicit * fallback, wildcard = one label)
    val cases = Seq(
      ("a.b.example.com", "example.com"),       // exact TLD
      ("example.com.br", "example.com.br"),     // multi-label registry
      ("x.y.example.co.jp", "example.co.jp"),
      ("com.br", null),                         // host IS a public suffix
      ("whatever.github.io", "whatever.github.io"), // private suffix
      ("deep.whatever.github.io", "whatever.github.io"),
      ("a.b.test.ck", "b.test.ck"),             // *.ck: test.ck is public
      ("test.ck", null),                        // wildcard swallows 2 labels
      ("www.ck", "www.ck"),                     // !www.ck exception
      ("x.www.ck", "www.ck"),
      ("example.zz", "example.zz"),             // unknown TLD: implicit *
      ("zz", null),                             // bare unknown TLD
      ("MIXED.Example.COM", "example.com"),     // case-folds
      (null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(c =>
        org.apache.spark.sql.Row(c._1, c._2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("want",
          org.apache.spark.sql.types.StringType))))
    val out = df.withColumn("got",
      Url.registeredDomainPsl(col("host"), Url.PslFixture)).collect()
    out.foreach(r => assert(r.getAs[String]("got") == r.getAs[String]("want"),
      s"${r.getAs[String]("host")} -> ${r.getAs[String]("got")} != ${r.getAs[String]("want")}"))
  }

  test("registeredDomainPsl: DataFrame-injected rules match Seq rules; comments skipped") {
    import graft.functions.PslRules
    val parsed = PslRules.parse(Url.PslFixture)
    assert(parsed.exact.contains("com.br") && !parsed.exact.contains("*.ck"))
    assert(parsed.wildcard == Set("ck") && parsed.exception == Set("www.ck"))
    assert(!parsed.exact.exists(_.startsWith("//")))
    val rulesDf = Url.PslFixture.toDF("suffix")
    val hosts = (0L until 200L).toDF("doc_id")
      .select(Url.syntheticPslHost(col("doc_id")).as("host"))
    val a = hosts.select(
      Url.registeredDomainPsl(col("host"), Url.PslFixture).as("r")).collect()
    val b = hosts.select(
      Url.registeredDomainPsl(col("host"), rulesDf).as("r")).collect()
    assert(a.sameElements(b))
    // map-only: no exchange in the executed plan
    val plan = hosts.withColumn("r",
        Url.registeredDomainPsl(col("host"), Url.PslFixture))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PSL lookup shuffled:\n$plan")
  }

  test("syntheticUrl is deterministic and parse round-trips it") {
    val docs = Seq((0L, "en"), (1L, "de"), (42L, "fr"))
      .toDF("doc_id", "lang")
    val a = docs.withColumn("url",
      Url.syntheticUrl(col("doc_id"), col("lang"))).collect()
    val b = docs.repartition(3).withColumn("url",
      Url.syntheticUrl(col("doc_id"), col("lang")))
      .orderBy("doc_id").collect()
    assert(a.map(_.getString(2)).sameElements(b.map(_.getString(2))))
    // every synthesized URL parses to a non-null host + reg_domain
    val parts = Url.urlParts(docs.withColumn("url",
      Url.syntheticUrl(col("doc_id"), col("lang"))), col("url"))
    assert(parts.filter(col("host").isNull ||
      col("reg_domain").isNull).count() == 0)
  }

  test("pathTemplate collapses digit runs; routeCensus shares are exact bp") {
    val tpl = Seq("/article/8231", "/article/97", "/cal/2021/7", "/a1b22c3/x")
      .toDF("p").select(Url.pathTemplate(col("p")).as("t"))
      .collect().map(_.getString(0))
    assert(tpl.sameElements(Seq(
      "/article/{n}", "/article/{n}", "/cal/{n}/{n}", "/a{n}b{n}c{n}/x")))
    // census: a.com has 3 urls on one template + 1 on another -> 7500/2500
    val parts = Seq(
      (1L, "a.com", "/p/1"), (2L, "a.com", "/p/2"), (3L, "a.com", "/p/3"),
      (4L, "a.com", "/about"), (5L, "b.net", "/x/9"))
      .toDF("doc_id", "reg_domain", "url_path")
    val out = Url.routeCensus(parts)
      .orderBy("reg_domain", "template")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(out.sameElements(Seq(
      ("a.com", "/about", 1L, 2500L), ("a.com", "/p/{n}", 3L, 7500L),
      ("b.net", "/x/{n}", 1L, 10000L))))
  }
}
