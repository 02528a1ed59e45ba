package graft.llm

import graft.SparkSpec

class UrlSpec extends SparkSpec {

  private def canon(raw: String): String =
    Url.canonicalize(raw).getOrElse(fail(s"quarantined: $raw")).url

  test("scheme and host lowercase; default ports strip; others keep") {
    assert(canon("HTTPS://WWW.Example.COM/A") == "https://www.example.com/A")
    assert(canon("http://h.io:80/x") == "http://h.io/x")
    assert(canon("https://h.io:443/x") == "https://h.io/x")
    assert(canon("https://h.io:8443/x") == "https://h.io:8443/x")
    assert(canon("http://h.io:443/x") == "http://h.io:443/x") // not http's default
    assert(canon("ftp://h.io:21/x") == "ftp://h.io:21/x") // unknown default: keep
  }

  test("dot segments resolve per RFC 3986 §5.2.4") {
    assert(canon("http://h/a/b/../c") == "http://h/a/c")
    assert(canon("http://h/p/./q/") == "http://h/p/q/")
    assert(canon("http://h/a/..") == "http://h/")
    assert(canon("http://h/../a") == "http://h/a") // leading .. dropped silently
    assert(canon("http://h/a/./") == "http://h/a/")
    assert(canon("http://h") == "http://h/") // empty path → "/"
    assert(canon("http://h/a//b") == "http://h/a//b") // empty mid-segment kept
  }

  test("percent-escapes: unreserved decode, reserved keep with upper hex") {
    assert(canon("http://h/%41%62%2D%5f%7e") == "http://h/Ab-_~")
    assert(canon("http://h/a%2fb") == "http://h/a%2Fb") // '/' stays encoded
    assert(canon("http://h/a%3Fb?x=%3d") == "http://h/a%3Fb?x=%3D")
    // %2E decodes to '.', and the resulting dot-segment then resolves
    assert(canon("http://h/a/%2E%2E/b") == "http://h/b")
  }

  test("query: tracking params drop, stable sort by key, fragment drops") {
    assert(canon("http://h/p?b=2&a=1#frag") == "http://h/p?a=1&b=2")
    assert(canon("http://h/p?utm_source=x&id=3&utm_campaign=y") == "http://h/p?id=3")
    assert(canon("http://h/p?fbclid=abc&gclid=d&msclkid=e&q=1") == "http://h/p?q=1")
    assert(canon("http://h/p?UTM_SOURCE=x&id=3") == "http://h/p?id=3") // case-insensitive key
    assert(canon("http://h/p?a=2&a=1") == "http://h/p?a=2&a=1") // dup keys: stable
    assert(canon("http://h/p?b&a=1") == "http://h/p?a=1&b") // bare key sorts too
    assert(canon("http://h/p?a=1&&b=2") == "http://h/p?a=1&b=2") // empty param dropped
    assert(canon("http://h/p?utm_source=x") == "http://h/p") // all dropped → no '?'
    assert(canon("http://h/p#only-frag") == "http://h/p")
  }

  test("quarantine: malformed URLs return None, never throw") {
    val bad = Seq(
      null, "", "h", "no-scheme/path", "://nohost", "1http://h/x",
      "http//h/x", "http:/h/x", "http://", "http://:8080/x",
      "http://user@h/x", "http://[::1]/x", "http://h:/x",
      "http://h:0/x", "http://h:65536/x", "http://h:8a/x", "http://h:123456/x",
      "http://h/a b", "http://h/a\tb", "http://h/\u00e9", "http://ho st/x",
      "http://h/a%2", "http://h/a%zz", "http://h/p?x=%G1",
      "http://h\u0000/x")
    bad.foreach { b =>
      assert(Url.canonicalize(b).isEmpty, s"accepted: $b")
    }
  }

  test("canonicalization is idempotent") {
    val raws = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/../c/?b=2&a=1&utm_source=x#f",
      "http://h.io:8080/%7Euser%2fdocs/%41?z=9&y=%3d",
      "http://h/a//b/./c/../d?dup=1&dup=0")
    raws.foreach { r =>
      val once = canon(r)
      assert(canon(once) == once, s"not idempotent: $r → $once → ${canon(once)}")
    }
  }

  test("canonicalizeAll dataset: valid flag audits, canonical is the dedup key") {
    import spark.implicits._
    val rows = Url.canonicalizeAll(Seq(
      1L -> "HTTP://A.io:80/x/./y?utm_source=s&k=1#f",
      2L -> "http://a.IO/x/y?k=1",
      3L -> "not a url").toDS()).collect().sortBy(_.doc_id)
    assert(rows.map(_.valid).toSeq == Seq(true, true, false))
    assert(rows(0).canonical == rows(1).canonical, "mangled twins must unify")
    assert(rows(0).canonical == "http://a.io/x/y?k=1")
    assert(rows(0).host == "a.io" && rows(2).host == "")
  }

  test("registrableDomain: PSL algorithm over the pinned suffix set") {
    import Url.registrableDomain
    // longest suffix wins: co.uk beats uk
    assert(registrableDomain("www.blog.x.co.uk").contains("x.co.uk"))
    assert(registrableDomain("x.co.uk").contains("x.co.uk"))
    assert(registrableDomain("a.b.x.com").contains("x.com"))
    assert(registrableDomain("x.com").contains("x.com"))
    // a host EQUAL to a suffix has no registrable domain
    assert(registrableDomain("co.uk").isEmpty)
    assert(registrableDomain("com").isEmpty)
    // unlisted TLD: PSL "*" default — last label is the suffix
    assert(registrableDomain("a.x.zzz").contains("x.zzz"))
    assert(registrableDomain("x.zzz").contains("x.zzz"))
    assert(registrableDomain("zzz").isEmpty) // single label
    // IPv4 literals, empties, malformed labels
    assert(registrableDomain("10.0.0.1").isEmpty)
    assert(registrableDomain("").isEmpty)
    assert(registrableDomain(null).isEmpty)
    assert(registrableDomain("a..com").isEmpty)
    // DNS root label: one trailing dot is the same FQDN — strip it
    // deliberately; leading dots and double trailing dots stay malformed
    assert(registrableDomain("example.com.").contains("example.com"))
    assert(registrableDomain("www.x.co.uk.").contains("x.co.uk"))
    assert(registrableDomain(".example.com").isEmpty)
    assert(registrableDomain("example.com..").isEmpty)
    assert(registrableDomain(".").isEmpty)
  }
}
