package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** PII redaction + bigram semantics (the rest of the text layer is pinned
  * by its oracle entries).
  */
class TextOpsSpec extends SparkSpec {

  test("redactPii: email/ip/phone tagged; order keeps the email out of the phone pattern") {
    import spark.implicits._
    val df = Seq((1L,
      "Reach me: John.Doe+x@Corp.Example.COM or 192.168.0.1 or +1 555-010-9999 done"))
      .toDF("id", "text")
    val out = df.select(TextOps.redactPii(TextOps.norm($"text")).as("r"))
      .head().getString(0)
    assert(out.contains("<EMAIL>") && out.contains("<IP>") && out.contains("<PHONE>"))
    assert(!out.contains("@") && !out.contains("192.168"), s"raw PII leaked: $out")
    // the email's digits must not have been half-eaten by the phone pass
    assert(out.startsWith("reach me: <EMAIL> or <IP> or <PHONE> done"), out)
  }

  test("redactPii: short digit runs survive; long digit-punct runs redact (recall over precision)") {
    import spark.implicits._
    val clean = "a plain sentence with the number 42 and version 1.2.3"
    val out = Seq((1L, clean)).toDF("id", "text")
      .select(TextOps.redactPii(TextOps.norm($"text")).as("r"))
      .head().getString(0)
    assert(out == clean, s"clean text must round-trip unchanged: $out")
    // an ISO date IS a ≥9-char digit-punct run — the phone pattern
    // deliberately takes it (false positives beat leaked numbers in a
    // training corpus); pinned so the tradeoff is explicit
    val dated = Seq((1L, "date 2024-01-02 end")).toDF("id", "text")
      .select(TextOps.redactPii(TextOps.norm($"text")).as("r"))
      .head().getString(0)
    assert(dated == "date <PHONE> end", dated)
  }

  test("url extraction and registered-domain reduction") {
    import spark.implicits._
    val text = "see https://a.b.files.example.org/x/y.html and http://localhost/z " +
      "plus http://cdn7-img.net/p.png trailing"
    val doms = Seq((1L, text)).toDF("id", "text")
      .select(explode(TextOps.urlsOf(TextOps.norm($"text"))).as("url"))
      .select($"url", TextOps.registeredDomainOf(TextOps.hostOf($"url")).as("dom"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(doms.keySet == Set("https://a.b.files.example.org/x/y.html",
      "http://localhost/z", "http://cdn7-img.net/p.png"))
    assert(doms("https://a.b.files.example.org/x/y.html") == "example.org",
      "deep subdomains reduce to the last two labels")
    assert(doms("http://localhost/z") == "localhost",
      "single-label hosts pass through (no ANSI element_at error)")
    assert(doms("http://cdn7-img.net/p.png") == "cdn7-img.net")
  }

  test("bigramsOf: n-1 bigrams, empty under 2 tokens") {
    import spark.implicits._
    val out = Seq((1L, "a b c d"), (2L, "solo"), (3L, ""))
      .toDF("id", "text")
      .select($"id", TextOps.bigramsOf(TextOps.tokens($"text")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b", "b c", "c d"))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("htmlToText: script/style content vanishes, tags space-split, entities decode once") {
    import spark.implicits._
    val cases = Seq(
      // script body with an embedded '<' must vanish WITH its content
      (1L, "<p>a</p><script>if (1 < 2) alert('x');</script><p>b</p>", "a b"),
      (2L, "<style>p { color: red }</style>hello", "hello"),
      // adjacent block tags must not fuse words
      (3L, "<div>left</div><div>right</div>", "left right"),
      (4L, "x <!-- secret --> y", "x y"),
      // &amp;lt; is the LITERAL text '&lt;' — single-pass decode, never '<'
      (5L, "a &amp;lt; b &lt;c&gt; &amp; d&nbsp;e", "a &lt; b <c> & d e"),
      (6L, "it&#39;s &quot;quoted&quot;", "it's \"quoted\""))
      .toDF("id", "html", "expect")
    val bad = cases
      .select($"id", TextOps.htmlToText($"html").as("got"), $"expect")
      .filter($"got" =!= $"expect")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }
}
