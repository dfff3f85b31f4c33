package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WebFunctions

class WebFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("t").select(c.as("r")).as[String].head()

  test("normalizeUrl: lowercases scheme+host, strips default port, drops fragment and utm_* params") {
    assert(one(WebFunctions.normalizeUrl($"t"),
      "HTTPS://WWW.Site.COM:443/Path/A?utm_source=x&id=7&utm_b=y&q=Z#frag")
      === "https://www.site.com/Path/A?id=7&q=Z")
    // path case preserved; non-default port kept; no query -> no '?'
    assert(one(WebFunctions.normalizeUrl($"t"), "http://A.B:8080/CaseD#x")
      === "http://a.b:8080/CaseD")
    // all params tracking -> query dropped entirely
    assert(one(WebFunctions.normalizeUrl($"t"), "http://a.b/p?utm_a=1&utm_b=2")
      === "http://a.b/p")
    // literal 'utm_' prefix only: 'utmx' param survives
    assert(one(WebFunctions.normalizeUrl($"t"), "http://a.b/p?utmx=1")
      === "http://a.b/p?utmx=1")
  }

  test("urlRegistrableHost: www-strip happens after lowercase+port-strip") {
    assert(one(WebFunctions.urlRegistrableHost($"t"),
      "HTTPS://WWW.Ex.Org:443/x") === "ex.org")
    // :80 stripped too; non-www host unchanged
    assert(one(WebFunctions.urlRegistrableHost($"t"),
      "http://news.site.com:80/") === "news.site.com")
  }

  test("stripHtml: script/style/nav blocks die, tags die, entities decode, whitespace squeezes") {
    val html = """<html><style>p{x}</style><body><div class="nav">menu home</div>""" +
      """<p>Tom &amp; Jerry</p><script>if (1 < 2) { alert("x"); }</script>""" +
      """<b>bold</b> &lt;tag&gt; &copy; end</body></html>"""
    assert(one(WebFunctions.stripHtml($"t"), html)
      === "Tom & Jerry bold <tag> end")
  }

  test("stripHtml: block patterns are non-greedy (two scripts don't swallow the text between)") {
    val html = "<script>a</script>KEEP<script>b</script>"
    assert(one(WebFunctions.stripHtml($"t"), html) === "KEEP")
  }

  test("fleschReadingEase: exact formula on a known sentence") {
    // "the cat sat." -> words=3, sentences=1, syllable groups: e,a,a -> 3
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(one(WebFunctions.fleschReadingEase($"t").cast("string"), "the cat sat.")
      === "119.19")
    // no period -> sentence floor of 1 (not division by zero)
    assert(one(WebFunctions.fleschReadingEase($"t").cast("string"), "the cat sat")
      === "119.19")
  }
}
