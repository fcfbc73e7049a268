package graft

import graft.ops.UrlOps
import org.apache.spark.sql.functions.col

/** Public-suffix (eTLD+1) matcher — every PSL rule class (r16 verdict
  * missing #3): exact, multi-level, wildcard, exception, private
  * suffixes, and the host == suffix null case. */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(hosts: Seq[String]): Map[String, (String, Option[String])] =
    hosts.toDF("host")
      .select(col("host"), UrlOps.publicSuffix(col("host")).as("sfx"),
        UrlOps.registrableDomain(col("host")).as("etld1"))
      .as[(String, String, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("suffix match: exact, longest-wins, implicit-star fallback") {
    val got = run(Seq(
      "example.com", "a.b.example.com", // plain TLD, deep subdomain
      "example.co.uk", "www.example.co.uk", // multi-level registry
      "foo.gov.uk",
      "site.example.unknowntld", // no rule -> implicit * (last label)
      "x.s3.amazonaws.com")) // 3-label private suffix beats com
    assert(got("example.com") == ("com", Some("example.com")))
    assert(got("a.b.example.com") == ("com", Some("example.com")))
    assert(got("example.co.uk") == ("co.uk", Some("example.co.uk")))
    assert(got("www.example.co.uk") == ("co.uk", Some("example.co.uk")))
    assert(got("foo.gov.uk") == ("gov.uk", Some("foo.gov.uk")))
    assert(got("site.example.unknowntld") ==
      ("unknowntld", Some("example.unknowntld")))
    assert(got("x.s3.amazonaws.com") ==
      ("s3.amazonaws.com", Some("x.s3.amazonaws.com")))
  }

  test("wildcard *.ck: every label under ck is a suffix; !www.ck excepted") {
    val got = run(Seq(
      "foo.ck", "bar.foo.ck", "a.bar.foo.ck",
      "www.ck", "sub.www.ck"))
    // wildcard: foo.ck IS a suffix -> nothing registrable at it
    assert(got("foo.ck") == ("foo.ck", None))
    assert(got("bar.foo.ck") == ("foo.ck", Some("bar.foo.ck")))
    assert(got("a.bar.foo.ck") == ("foo.ck", Some("bar.foo.ck")))
    // exception prevails over the wildcard: www.ck is registrable
    assert(got("www.ck") == ("ck", Some("www.ck")))
    assert(got("sub.www.ck") == ("ck", Some("www.ck")))
  }

  test("private suffixes: platform subdomains are independently registrable") {
    val got = run(Seq(
      "user.github.io", "page.user.github.io", "github.io",
      "blog.blogspot.com", "blogspot.com"))
    assert(got("user.github.io") == ("github.io", Some("user.github.io")))
    assert(got("page.user.github.io") ==
      ("github.io", Some("user.github.io")))
    // the suffix itself: NOTHING registrable (null, never a silent pool)
    assert(got("github.io") == ("github.io", None))
    assert(got("blog.blogspot.com") ==
      ("blogspot.com", Some("blog.blogspot.com")))
    assert(got("blogspot.com") == ("blogspot.com", None))
    // single-label host == implicit suffix
    assert(run(Seq("localhost"))("localhost") == ("localhost", None))
  }

  test("quota fixture: subdomain families share one eTLD+1 budget") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val hosts = docs.select(col("doc_id"),
      UrlOps.hostVariantFixture(col("doc_id")).as("host"))
      .select(col("doc_id"), col("host"),
        UrlOps.registrableDomain(col("host")).as("etld1"),
        UrlOps.hostVariantEtld1(col("doc_id")).as("expected"))
      .as[(Long, String, String, String)].collect()
    hosts.foreach { case (id, host, got, exp) =>
      assert(got == exp, s"doc $id host $host")
    }
    // the www./cdn./m. family of one domain really collapses: for the
    // .com class, four distinct hosts -> one registrable domain
    val fam = hosts.filter(_._2.endsWith("d1-site.com"))
    assert(fam.map(_._2).distinct.length > 1)
    assert(fam.map(_._3).distinct.toSeq == Seq("d1-site.com"))
  }
}
