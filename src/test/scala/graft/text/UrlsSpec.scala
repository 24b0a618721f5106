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
