package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def hostAndDomain(urls: Seq[String]): Map[String, (String, String)] =
    urls.toDF("url")
      .select(col("url"), Urls.normalizedHost(col("url")).as("h"))
      .withColumn("d", Urls.registrableDomain(col("h")))
      .as[(String, String, String)].collect()
      .map { case (u, h, d) => u -> (h, d) }.toMap

  test("normalizedHost + registrableDomain cover every URL shape") {
    val got = hostAndDomain(Seq(
      "https://www.example.com/a/b?q=1",
      "http://example.co.uk/x?q=3",
      "example.org/p",
      "https://blog.example.com:8080/a#frag",
      "ftp://user:pw@files.example.net/f.bin",
      "https://sub.example.gov.au/q?a=1&b=2",
      "HTTPS://WWW.EXAMPLE.COM/CAPS",
      "localhost:9000/dev",
      "co.uk",
      "nodots"))
    assert(got("https://www.example.com/a/b?q=1") === ("example.com", "example.com"))
    assert(got("http://example.co.uk/x?q=3") === ("example.co.uk", "example.co.uk"))
    assert(got("example.org/p") === ("example.org", "example.org"))
    assert(got("https://blog.example.com:8080/a#frag") === ("blog.example.com", "example.com"))
    assert(got("ftp://user:pw@files.example.net/f.bin") === ("files.example.net", "example.net"))
    assert(got("https://sub.example.gov.au/q?a=1&b=2") === ("sub.example.gov.au", "example.gov.au"))
    // case-normalized
    assert(got("HTTPS://WWW.EXAMPLE.COM/CAPS") === ("example.com", "example.com"))
    // bare host with port: its own domain
    assert(got("localhost:9000/dev") === ("localhost", "localhost"))
    // a bare multi-part suffix is returned as-is (not registrable, but
    // never empty), and a dot-less name is its own domain
    assert(got("co.uk") === ("co.uk", "co.uk"))
    assert(got("nodots") === ("nodots", "nodots"))
  }

  test("parser is total: arbitrary junk never throws, invariants hold (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val junkGen = Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(':', '/', '.', '@', '?', '#', '%', ' ', '\t')))
      .map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(8, junkGen)) { urls =>
      val rows = urls.toDF("url")
        .select(Urls.normalizedHost(col("url")).as("h"))
        .withColumn("d", Urls.registrableDomain(col("h")))
        .as[(String, String)].collect()
      rows.forall { case (h, dm) =>
        // host never carries a www. prefix, never contains a separator
        // the regex stops at, and the domain is a suffix of the host
        // (or the host itself for dot-less names)
        !h.startsWith("www.") &&
          !h.exists(c => c == '/' || c == ':' || c == '?' || c == '#') &&
          (h.isEmpty || h.endsWith(dm))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("domainGate drops denied apex domains including their subdomains") {
    val docs = Seq(
      (1L, "https://www.spamfarm.com/offer"),
      (2L, "https://cdn.spamfarm.com/asset"),
      (3L, "https://example.org/fine"),
      (4L, "http://keep.co.uk/page")).toDF("doc_id", "url")
    val deny = Seq("spamfarm.com").toDF("domain")
    val kept = Urls.domainGate(docs, col("url"), deny)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))
    // gate preserves the input columns untouched
    assert(Urls.domainGate(docs, col("url"), deny).columns.toSeq
      === Seq("doc_id", "url"))
  }

  test("canonicalUrl: every normalization rule, one shape each") {
    val got = Seq(
      "https://www.X.com/a?utm_source=f#t",
      "http://user@x.com:80/p?utm_a=1&q=2&utm_b=3",
      "x.com:8080/P",
      "https://x.com:443/",
      "x.com:80",
      "https://x.com/dir/",
      "https://x.com/?utm_a=1",
      "https://x.com/a?fbclid=1&gclid=2&q=3")
      .toDF("url")
      .select(col("url"), Urls.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    // fragment + tracking params + www + case, all at once
    assert(got("https://www.X.com/a?utm_source=f#t") === "https://x.com/a")
    // userinfo dropped, default http port dropped, inner tracking param
    // removed with separators re-collapsed
    assert(got("http://user@x.com:80/p?utm_a=1&q=2&utm_b=3")
      === "http://x.com/p?q=2")
    // non-default port and path CASE preserved
    assert(got("x.com:8080/P") === "x.com:8080/P")
    // https default port + bare root slash dropped
    assert(got("https://x.com:443/") === "https://x.com")
    // scheme-less default http port dropped
    assert(got("x.com:80") === "x.com")
    // deep trailing slash is semantic — kept
    assert(got("https://x.com/dir/") === "https://x.com/dir/")
    // tracking-only query collapses away entirely, then the root slash
    assert(got("https://x.com/?utm_a=1") === "https://x.com")
    // consecutive tracking params collapse their separators
    assert(got("https://x.com/a?fbclid=1&gclid=2&q=3")
      === "https://x.com/a?q=3")
  }

  test("dedupByCanonicalUrl: variants of one page collapse to the min-id survivor") {
    val docs = Seq(
      (5L, "https://www.x.com/a/b"),
      (2L, "https://x.com/a/b#frag"),
      (9L, "HTTPS://X.COM:443/a/b?utm_source=f"),
      (7L, "https://y.org/other"))
      .toDF("doc_id", "url")
    val kept = Urls.dedupByCanonicalUrl(docs, col("url"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 7L))
    // survivors keep their original columns untouched
    assert(Urls.dedupByCanonicalUrl(docs, col("url"), col("doc_id"))
      .columns.toSeq === Seq("doc_id", "url"))
  }

  test("loadPslMultiPart: full list DIVERGES from the embedded subset where the subset is blind") {
    // a miniature publicsuffix.org-format file: comments, single-label
    // rules, plain multi-part rules (incl. one the embedded subset lacks:
    // com.ar), a 3-label rule, a wildcard, and an exception rule
    val psl = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(psl, Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "com", "uk", "co.uk", "COM.AR", "com.pk", "co.il",
      "city.kawasaki.jp", "*.ck", "!www.ck", "").mkString("\n"))
    val full = Urls.loadPslMultiPart(spark, psl.toString)
    // parsed: lowercased, single-label + exception dropped, wildcard
    // reduced to its parent ("ck" — single-label, dropped), sorted
    assert(full === Seq("city.kawasaki.jp", "co.il", "co.uk", "com.ar", "com.pk"))
    val urls = Seq("https://www.shop.com.ar/x", "http://news.co.il/y",
      "https://sub.city.kawasaki.jp/z", "https://blog.example.co.uk/w")
    def doms(sfx: Seq[String]): Map[String, String] = urls.toDF("url")
      .select(col("url"),
        Urls.registrableDomain(Urls.normalizedHost(col("url")), sfx).as("d"))
      .as[(String, String)].collect().toMap
    val embedded = doms(Urls.multiPartSuffixes)
    val loaded = doms(full)
    // the subset mis-keys com.ar / co.il hosts at the suffix itself;
    // the full list recovers the true registrable domain
    assert(embedded("https://www.shop.com.ar/x") === "com.ar")
    assert(loaded("https://www.shop.com.ar/x") === "shop.com.ar")
    assert(embedded("http://news.co.il/y") === "co.il")
    assert(loaded("http://news.co.il/y") === "news.co.il")
    // 3-label rule extends to four labels under the full list
    assert(embedded("https://sub.city.kawasaki.jp/z") === "kawasaki.jp")
    assert(loaded("https://sub.city.kawasaki.jp/z") === "sub.city.kawasaki.jp")
    // where both lists carry the rule, they agree
    assert(embedded("https://blog.example.co.uk/w") === "example.co.uk")
    assert(loaded("https://blog.example.co.uk/w") === "example.co.uk")
  }

  test("canonicalUrl tracking strip is case-insensitive and value-optional (r13 ADVICE)") {
    val got = Seq(
      "https://x.com/a?UTM_SOURCE=f",     // upper-case name
      "https://x.com/a?fbclid",           // valueless, only param
      "https://x.com/a?fbclid&q=1",       // valueless then real param
      "https://x.com/a?q=1&fbclid",       // real param then valueless
      "https://x.com/a?fbclid&gclid",     // two consecutive valueless
      "https://x.com/a?fbclid2=x",        // NOT a tracking param (suffix)
      "https://x.com/a?FbClId=1&q=2")     // mixed case with value
      .toDF("url")
      .select(col("url"), Urls.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    assert(got("https://x.com/a?UTM_SOURCE=f") === "https://x.com/a")
    assert(got("https://x.com/a?fbclid") === "https://x.com/a")
    assert(got("https://x.com/a?fbclid&q=1") === "https://x.com/a?q=1")
    assert(got("https://x.com/a?q=1&fbclid") === "https://x.com/a?q=1")
    assert(got("https://x.com/a?fbclid&gclid") === "https://x.com/a")
    // a name that merely STARTS with a tracking name is not stripped —
    // the valueless rule anchors on the following separator/end
    assert(got("https://x.com/a?fbclid2=x") === "https://x.com/a?fbclid2=x")
    assert(got("https://x.com/a?FbClId=1&q=2") === "https://x.com/a?q=2")
  }

  test("registrableDomainPsl: full PSL semantics — wildcards, exceptions, any depth") {
    val rules = Urls.PslRules(
      literals = (Urls.multiPartSuffixes ++
        Seq("city.kawasaki.jp", "s3.cn-north-1.amazonaws.cn")).sorted,
      wildcards = Seq("ck", "compute.example.com"),
      exceptions = Seq("www.ck"))
    def doms(hosts: Seq[String]): Map[String, String] = hosts.toDF("h")
      .select(col("h"), Urls.registrableDomainPsl(col("h"), rules).as("d"))
      .as[(String, String)].collect().toMap
    val got = doms(Seq(
      "example.com", "a.shop.ck", "x.www.ck", "www.ck",
      "sub.site.city.kawasaki.jp", "b.s3.cn-north-1.amazonaws.cn",
      "vm.zone.compute.example.com", "deep.vm.zone.compute.example.com",
      "blog.example.co.uk", "shop.ck", "nodots", "co.uk"))
    // default last-2
    assert(got("example.com") === "example.com")
    // wildcard *.ck: suffix = shop.ck, domain = a.shop.ck
    assert(got("a.shop.ck") === "a.shop.ck")
    // exception !www.ck beats the wildcard: the exception IS the domain,
    // for hosts under it and for the exception host itself
    assert(got("x.www.ck") === "www.ck")
    assert(got("www.ck") === "www.ck")
    // 3-label literal
    assert(got("sub.site.city.kawasaki.jp") === "site.city.kawasaki.jp")
    // 4-label literal
    assert(got("b.s3.cn-north-1.amazonaws.cn")
      === "b.s3.cn-north-1.amazonaws.cn")
    // 3-label wildcard parent: suffix = zone.compute.example.com
    assert(got("vm.zone.compute.example.com")
      === "vm.zone.compute.example.com")
    assert(got("deep.vm.zone.compute.example.com")
      === "vm.zone.compute.example.com")
    // embedded-subset literals still work
    assert(got("blog.example.co.uk") === "example.co.uk")
    // graceful boundaries: host IS a public suffix → last-2 fallback;
    // dot-less host is its own domain
    assert(got("shop.ck") === "shop.ck")
    assert(got("co.uk") === "co.uk")
    assert(got("nodots") === "nodots")
  }

  test("loadPsl parses all three rule kinds losslessly; literal-only rules match registrableDomain") {
    val psl = java.nio.file.Files.createTempFile("pslfull", ".dat")
    java.nio.file.Files.writeString(psl, Seq(
      "// comments dropped",
      "com", "uk", "co.uk", "COM.AR", "city.kawasaki.jp",
      "*.ck", "*.compute.example.com", "!www.ck", "!city.kobe.jp",
      "").mkString("\n"))
    val rules = Urls.loadPsl(spark, psl.toString)
    assert(rules.literals === Seq("city.kawasaki.jp", "co.uk", "com.ar"))
    assert(rules.wildcards === Seq("ck", "compute.example.com"))
    assert(rules.exceptions === Seq("city.kobe.jp", "www.ck"))
    // on hosts touched only by literal rules, the full matcher agrees
    // with the Seq-based matcher fed loadPslMultiPart of the same file
    val lits = Urls.loadPslMultiPart(spark, psl.toString)
    val hosts = Seq("a.b.co.uk", "x.shop.com.ar", "s.city.kawasaki.jp",
      "plain.org")
    val viaFull = hosts.toDF("h")
      .select(col("h"), Urls.registrableDomainPsl(col("h"), rules).as("d"))
      .as[(String, String)].collect().toMap
    val viaSeq = hosts.toDF("h")
      .select(col("h"), Urls.registrableDomain(col("h"), lits).as("d"))
      .as[(String, String)].collect().toMap
    assert(viaFull === viaSeq)
  }

  test("domainGate under PslRules keys on the true wildcard/exception domains") {
    val rules = Urls.PslRules(literals = Urls.multiPartSuffixes,
      wildcards = Seq("ck"), exceptions = Seq("www.ck"))
    val docs = Seq(
      (1L, "https://a.spam.ck/x"),   // domain a.spam.ck — denied
      (2L, "https://b.spam.ck/y"),   // domain b.spam.ck — NOT denied
      (3L, "https://x.www.ck/z"),    // exception: domain www.ck — denied
      (4L, "https://ok.org/w")).toDF("doc_id", "url")
    val deny = Seq("a.spam.ck", "www.ck").toDF("domain")
    val kept = Urls.domainGate(docs, col("url"), deny, rules)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("withRegistrableDomain matches the embedded-subset function when fed the same suffixes") {
    val docs = Seq(
      (1L, "https://www.a.co.uk/x"),
      (2L, "https://b.example.com/y"),
      (3L, "localhost/z")).toDF("doc_id", "url")
    val suffixes = Urls.multiPartSuffixes.toDF("suffix")
    val viaRelation = Urls.withRegistrableDomain(docs, col("url"),
        suffixes, "domain")
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    val viaEmbedded = docs.select(col("doc_id"),
        Urls.registrableDomain(Urls.normalizedHost(col("url"))).as("domain"))
      .as[(Long, String)].collect().toMap
    assert(viaRelation === viaEmbedded)
  }
}
