package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Hand-picked URL canonicalization / registered-domain cases — one per
  * normalization rule (case, default ports, tracking params, fragments,
  * multi-label public suffixes, no-match fallthrough). */
class UrlOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def one(url: String): (String, String) = {
    val df = spark.createDataFrame(
      Seq(Row(url)).asJava,
      StructType(Seq(StructField("url", StringType, nullable = false))))
    val r = df.select(
      UrlOps.normalizeUrl(col("url")),
      UrlOps.registeredDomain(UrlOps.hostOf(col("url")))).head()
    (r.getString(0), r.getString(1))
  }

  test("normalizeUrl lowercases, strips default port, fragment, and tracking params") {
    assert(one("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&q=1&ref=h#frag") ==
      (("https://www.example.com/a/b?q=1", "example.com")))
  }

  test("normalizeUrl keeps non-default ports and non-tracking params in order") {
    assert(one("https://shop.corpus.io:8080/p?b=2&a=1") ==
      (("https://shop.corpus.io:8080/p?b=2&a=1", "corpus.io")))
  }

  test("normalizeUrl drops the '?' when every param was tracking") {
    assert(one("http://mirror.org:80/x?utm_campaign=only&gclid=1&fbclid=2") ==
      (("http://mirror.org/x", "mirror.org")))
  }

  test("registeredDomain matches the longest public suffix first") {
    assert(one("https://a.b.openweb.co.uk/")._2 == "openweb.co.uk")
    assert(one("https://example.co.uk/")._2 == "example.co.uk")
  }

  test("registeredDomain passes unknown suffixes through unchanged") {
    assert(one("https://intranet.local/x")._2 == "intranet.local")
  }

  test("syntheticUrl round-trips through the normalizer non-vacuously") {
    // every generator arm appears in 0..1000 and the normalizer output
    // must be stable: normalizing twice changes nothing (idempotence)
    val df = spark.range(0, 1000)
      .select(UrlOps.syntheticUrl(col("id")).as("url"))
      .select(col("url"), UrlOps.normalizeUrl(col("url")).as("n1"))
      .select(col("url"), col("n1"), UrlOps.normalizeUrl(col("n1")).as("n2"))
    assert(df.filter(col("n1") =!= col("n2")).count() == 0)
    assert(df.filter(col("url") =!= col("n1")).count() > 0,
      "the generator must emit URLs the normalizer actually changes")
  }

  test("qualityKeep agrees with qualityFilter's keep verdict") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val viaFilter = TextAnalysis.qualityFilter(d)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaKeep = d.select(col("doc_id"),
        TextAnalysis.qualityKeep(col("text")).as("k")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaFilter == viaKeep)
    assert(viaKeep.values.exists(identity) && viaKeep.values.exists(!_),
      "fixture must exercise both verdicts")
  }

  test("domainReputationFilter keeps whole domains by pass rate, tags each doc") {
    val spark0 = spark
    import spark0.implicits._
    // good.com: 2/2 pass; bad.org: 1/3 pass (33% < 50%)
    val rows = Seq(
      (1L, "https://good.com/a", true), (2L, "https://good.com/b", true),
      (3L, "https://bad.org/a", true), (4L, "https://bad.org/b", false),
      (5L, "https://bad.org/c", false))
      .toDF("doc_id", "url", "ok")
    val out = UrlOps.domainReputationFilter(rows, col("url"), col("ok"),
      minPassPct = 50).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).sorted.sameElements(Array(1L, 2L)))
    out.foreach { case (_, dom, keep, nDocs, nOk) =>
      assert(dom == "good.com" && keep && nDocs == 2L && nOk == 2L)
    }
  }

  test("trackingParamProfile: utm incidence per domain, exact per-mille") {
    val spark0 = spark
    import spark0.implicits._
    val urls = Seq(
      "https://a.com/x?utm_source=feed",  // leading utm
      "https://a.com/y?q=1&utm_campaign=z", // embedded utm
      "https://a.com/z?q=2&ref=home",     // ref= is NOT campaign tagging
      "https://b.org/p?q=3").toDF("url")
    val out = UrlOps.trackingParamProfile(urls).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("a.com") == ((3L, 2L, 666L)))
    assert(out("b.org") == ((1L, 0L, 0L)))
  }
}
