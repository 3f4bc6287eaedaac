package graft

import org.apache.spark.sql.functions.col
import graft.textops.UrlOps

class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalizeUrl: case, www, ports, slashes, tracking, sort, fragment") {
    assert(canon(
      "HTTPS://WWW.Ex.COM:443//a//b/?utm_source=f&z=9&a=2#frag",
      "http://ex.com:80/a",
      "https://ex.com:8443/a",
      "http://u:p@host.ex.com/x") == Seq(
      Some("https://ex.com/a/b?a=2&z=9"),
      Some("http://ex.com/a"),
      Some("https://ex.com:8443/a"),
      // userinfo is dropped with the rest of the non-canonical authority
      Some("http://host.ex.com/x")))
  }

  test("canonicalizeUrl: root forms unify; empty/tracking-only query drops") {
    assert(canon(
      "https://ex.com",
      "https://ex.com/",
      "https://ex.com/?utm_campaign=x&fbclid=abc",
      "https://www.ex.com/?gclid=1") ==
      Seq.fill(4)(Some("https://ex.com")))
  }

  test("canonicalizeUrl: garbage and hostless input go null, not error") {
    assert(canon("not a url", "file:///x", "%%%") ==
      Seq(None, None, None))
  }

  test("hostOf and registrableDomain: suffix ranking and fallbacks") {
    val rows = Seq(
      "https://a.b.Example.co.uk/x",
      "https://www.example.com/x",
      "https://sub.example.unknowntld/x",
      "https://com/x")
      .toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"))
      .select(col("h"), UrlOps.registrableDomain(col("h")).as("d"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq(
      ("a.b.example.co.uk", Some("example.co.uk")), // co.uk beats uk/com
      ("example.com", Some("example.com")),
      ("sub.example.unknowntld", Some("example.unknowntld")), // last-2 fallback
      ("com", None))) // a bare suffix has no registrable part
  }
}
