package graft

import graft.functions.UrlNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def norm(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("url").select(UrlNorm.normalize(col("url"))).head().getString(0)
  }

  test("canonical forms") {
    // scheme+host lowercased, path case preserved (RFC 3986)
    assert(norm("HTTPS://WWW.Example.COM/Path/To") == "https://www.example.com/Path/To")
    // default ports dropped; non-default kept
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("https://a.com:443") == "https://a.com")
    assert(norm("https://a.com:8080/x") == "https://a.com:8080/x")
    // fragments dropped
    assert(norm("https://a.com/x#sec-2") == "https://a.com/x")
    // utm_* tracking params dropped, other params kept
    assert(norm("https://a.com/x?utm_source=f&id=7") == "https://a.com/x?id=7")
    assert(norm("https://a.com/x?id=7&utm_campaign=c") == "https://a.com/x?id=7")
    assert(norm("https://a.com/x?utm_source=f") == "https://a.com/x")
    // trailing slashes trimmed (root too — host IS the canonical page)
    assert(norm("https://a.com/x/") == "https://a.com/x")
    assert(norm("https://a.com/") == "https://a.com")
    // idempotent: normalizing a canonical url is a no-op
    val c = "https://www.example-1.com/Products/51?id=3"
    assert(norm(c) == c)
  }

  test("key-collision edge cases (round-2 review findings)") {
    // ':80/' in the PATH is a legal path char sequence — must survive
    assert(norm("https://a.com/files/report:80/summary")
      == "https://a.com/files/report:80/summary")
    // non-default port for the scheme is a DIFFERENT endpoint — survives
    assert(norm("http://a.com:443/x") == "http://a.com:443/x")
    assert(norm("https://a.com:80/x") == "https://a.com:80/x")
    // 'utm_' mid-token is a different parameter, not tracking
    assert(norm("https://a.com/x?autm_source=1") == "https://a.com/x?autm_source=1")
    // utm at a real boundary goes, whatever its position
    assert(norm("https://a.com/x?utm_a=1&id=7") == "https://a.com/x?id=7")
    assert(norm("https://a.com/x?id=7&utm_a=1") == "https://a.com/x?id=7")
    assert(norm("https://a.com/x?utm_a=1&utm_b=2") == "https://a.com/x")
    // params whose VALUE mentions utm_ survive
    assert(norm("https://a.com/x?q=utm_source") == "https://a.com/x?q=utm_source")
    // a slash ending a query VALUE distinguishes pages — only PATH
    // trailing slashes are trimmed
    assert(norm("https://h/p?next=/home/") == "https://h/p?next=/home/")
    assert(norm("https://h/p/?id=3") == "https://h/p?id=3")
    assert(norm("https://h/p/?utm_a=1") == "https://h/p")
  }
}
