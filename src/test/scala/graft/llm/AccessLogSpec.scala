package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class AccessLogSpec extends AnyFunSuite {

  private val combined = "192.168.0.1 - frank [10/Oct/2000:13:55:36 -0700] " +
    "\"GET /apache_pb.gif HTTP/1.0\" 200 2326 " +
    "\"http://www.example.com/start.html\" \"Mozilla/4.08 [en] (Win98)\""

  test("parses the canonical combined example") {
    val r = AccessLog.parse(1L, combined).get
    assert(r.host == "192.168.0.1" && r.user == "frank")
    assert(r.ts_raw == "10/Oct/2000:13:55:36 -0700")
    assert(r.method == "GET" && r.path == "/apache_pb.gif" && r.proto == "HTTP/1.0")
    assert(r.status == 200 && r.bytes == 2326L)
    assert(r.referer.contains("http://www.example.com/start.html"))
    assert(r.user_agent.contains("Mozilla/4.08 [en] (Win98)"))
  }

  test("plain CLF (no referer/UA) parses with None extensions") {
    val r = AccessLog.parse(2L,
      "10.0.0.5 - u7 [10/Oct/2000:13:55:36 +0000] \"POST /buy/3 HTTP/1.1\" 301 99").get
    assert(r.method == "POST" && r.status == 301 && r.bytes == 99L)
    assert(r.referer.isEmpty && r.user_agent.isEmpty)
  }

  test("'-' bytes (no body) surfaces as -1") {
    val r = AccessLog.parse(3L,
      "h - u [t] \"GET / HTTP/1.1\" 304 -").get
    assert(r.bytes == -1L)
  }

  test("a UA containing a bracketed island does not confuse the walker") {
    val r = AccessLog.parse(4L, combined).get
    assert(r.user_agent.get.contains("[en]"))
  }

  test("quarantine: malformed lines return None, never throw") {
    val bad = Seq(
      "",                                                          // empty
      "h - u 10/Oct/2000 \"GET / HTTP/1.1\" 200 5",                // no bracket
      "h - u [t] \"GET / HTTP/1.1\" 200",                          // no bytes
      "h - u [t] \"GET / HTTP/1.1\" abc 5",                        // bad status
      "h - u [t] \"GET / HTTP/1.1\" 99 5",                         // status range
      "h - u [t] \"GETONLY\" 200 5",                               // bad request
      "h - u [t] \"GET / HTTP/1.1 200 5")                          // unterminated
    for (l <- bad) assert(AccessLog.parse(9L, l).isEmpty, s"should reject: $l")
  }
}
