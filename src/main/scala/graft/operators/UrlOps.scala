package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL normalization and registered-domain extraction — the web-corpus
 * operators every large-scale pipeline applies before quality filtering:
 * group/filter/dedup by registered domain, sample at domain granularity,
 * canonicalize URLs so near-identical links dedup exactly. North-star
 * extension (SURVEY.md §2.2); the reference has no URL surface.
 *
 * Scale design (100 TB posture): every function here is a pure narrow
 * per-row projection built from codegen'd string/regex expressions — no
 * UDF, no shuffle, no driver state. The public-suffix table rides the
 * plan as a compile-time literal CASE chain (the codebook pattern: the
 * artifact is bounded and versioned with the code, never joined). All
 * regexes live in the Java∩RE2∩DuckDB common subset so the DuckDB
 * oracle replays them byte-for-byte.
 */
object UrlOps {

  /**
   * Public-suffix table, longest (most-label) suffixes first — a small
   * representative slice of the public-suffix list; extend in one place.
   * Longest-first ordering is load-bearing: "example.co.uk" must match
   * "co.uk" before the bare "uk" case would misread its registered
   * domain as "co.uk".
   */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp",
    "com", "org", "net", "io", "edu", "gov", "uk", "jp", "au")
  require(PublicSuffixes == PublicSuffixes.sortBy(s => -s.count(_ == '.')),
    "PublicSuffixes must be ordered longest (most labels) first")

  /** Tracking-parameter prefixes stripped by [[normalizeUrl]] (shared
    * with the oracle): prefix-compare, not regex, so `utm_` can't be
    * read as a LIKE wildcard on either engine. */
  val TrackingPrefixes: Seq[String] =
    Seq("utm_", "ref=", "gclid=", "fbclid=")

  /** Lowercased host (no port) of a URL. */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1)),
      ":[0-9]+$", "")

  /**
   * Canonical URL: lowercase scheme and host, default port stripped
   * (http:80 / https:443), fragment dropped, tracking params
   * (`utm_*`, `ref`, `gclid`, `fbclid`) removed with remaining params
   * kept in original order, and a now-empty query dropped entirely.
   */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hp = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1))
    val host = regexp_replace(hp, ":[0-9]+$", "")
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val path = regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val q = regexp_extract(url, "[?]([^#]*)", 1)
    val kept = filter(split(q, "&"), p =>
      p =!= lit("") && TrackingPrefixes
        .map(t => substring(p, 1, t.length) =!= lit(t))
        .reduce(_ && _))
    val qn = array_join(kept, "&")
    val portN = when(port === lit("") ||
        (scheme === lit("http") && port === lit("80")) ||
        (scheme === lit("https") && port === lit("443")), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), host, portN, path,
      when(qn =!= lit(""), concat(lit("?"), qn)).otherwise(lit("")))
  }

  /**
   * Registered (pay-level) domain of a lowercase host: the label
   * immediately left of the longest matching public suffix, plus the
   * suffix — "www.example.co.uk" → "example.co.uk". A host matching no
   * table entry (intranet names, IPs) falls through unchanged.
   */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    PublicSuffixes
      .map(s => regexp_extract(h, "([^.]+[.]" + s.replace(".", "[.]") + ")$", 1))
      .foldRight(h)((ex, els) => when(ex =!= lit(""), ex).otherwise(els))
  }

  /**
   * Deterministic synthetic URL for a non-negative integer id — the
   * fixture-injection generator for the URL family (the corpus has no
   * URL column; q53's injection pattern). Deliberately messy: mixed-case
   * scheme/host, www and bare hosts, multi-label public suffixes,
   * default and non-default ports, tracking params in leading /
   * trailing / only positions, and fragments — one arm per
   * normalization rule, selected by small-modulus arithmetic so the
   * oracle rebuilds the identical string.
   */
  def syntheticUrl(id: Column): Column = {
    val dom = when(id % 4 === 0, lit("example"))
      .when(id % 4 === 1, lit("openweb"))
      .when(id % 4 === 2, lit("corpus")).otherwise(lit("mirror"))
    val sfx = when(id % 3 === 0, lit("com"))
      .when(id % 3 === 1, lit("co.uk")).otherwise(lit("org"))
    val hostBase = concat(
      when(id % 2 === 0, lit("www.")).otherwise(lit("")),
      dom, lit("."), sfx)
    val host = when(id % 5 === 0, upper(hostBase)).otherwise(hostBase)
    val scheme = when(id % 7 === 2, lit("http"))
      .when(id % 11 === 0, lit("HTTPS")).otherwise(lit("https"))
    val port = when(id % 7 === 0, lit(":443"))
      .when(id % 7 === 1, lit(":8080"))
      .when(id % 7 === 2, lit(":80")).otherwise(lit(""))
    val query = when(id % 13 === 0, lit("?utm_source=only"))
      .when(id % 2 === 0,
        concat(lit("?utm_source=feed&q="), id % 10, lit("&utm_campaign=x")))
      .otherwise(concat(lit("?q="), id % 10, lit("&ref=home")))
    val frag = when(id % 3 === 0, lit("#section2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, lit("/docs/"), id, query, frag)
  }

  /**
   * Tracking-parameter incidence per registered domain: how many of a
   * domain's URLs carry `utm_`-style tracking params, as an exact
   * per-mille share — the PRE-normalization audit that predicts how
   * much URL dedup ([[normalizeUrl]]) will collapse per domain, and
   * flags feeds whose links are wholly campaign-tagged (syndication/
   * ad-network provenance).
   *
   * Spark shape: narrow URL projections then ONE hash aggregation on
   * the registered domain (map-side partial conditional counts).
   * Default prefixes profile `utm_` campaign tags specifically (the
   * full [[TrackingPrefixes]] list includes `ref=`, which ordinary
   * navigation links also carry — useful for normalization, too broad
   * for a provenance signal).
   */
  def trackingParamProfile(urls: DataFrame,
      prefixes: Seq[String] = Seq("utm_"),
      urlCol: String = "url"): DataFrame = {
    val hasTracking = prefixes
      .map(p => col(urlCol).contains(s"?$p") || col(urlCol).contains(s"&$p"))
      .reduce(_ || _)
    urls
      .select(registeredDomain(hostOf(col(urlCol))).as("reg_domain"),
        when(hasTracking, 1L).otherwise(0L).as("__t"))
      .groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("n_urls"), sum(col("__t")).as("n_tracking"))
      .withColumn("tracking_per_mille",
        expr("(n_tracking * 1000) div n_urls"))
  }

  /**
   * Domain-reputation filter — the web-corpus two-pass: pass 1
   * aggregates each registered domain's per-document quality pass rate;
   * pass 2 keeps every document of a domain clearing `minPassPct`.
   * Spam/SEO farms fail wholesale even where individual pages slip past
   * per-doc rules; each surviving doc still carries its own verdict
   * (`doc_keep`) plus the domain stats for downstream weighting.
   *
   * Scale shape: pass 1 is ONE hash agg keyed on the domain (map-side
   * partial count/sum over an int flag); the good-domain table is
   * bounded by distinct-domain cardinality and broadcast back, so the
   * corpus itself never shuffles. (A web-scale domain table beyond
   * broadcast reach degrades gracefully: drop the hint and the join-back
   * becomes a standard equi-join on a high-cardinality key.) The verdict
   * is integer cross-multiplication — float-free.
   */
  def domainReputationFilter(docs: DataFrame, url: Column, keep: Column,
      minPassPct: Int = 90, idCol: String = "doc_id"): DataFrame = {
    // cache the 3-column projection: the two passes (domain agg +
    // join-back) would otherwise each re-evaluate `keep`, which is the
    // expensive part (rule batteries over full text)
    val d = graft.SparkUtil.trackCache(docs.select(col(idCol),
      registeredDomain(hostOf(url)).as("reg_domain"),
      keep.cast("int").as("__ok")))
    val domains = d.groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("n_domain_docs"),
        sum(col("__ok")).as("n_domain_ok"))
      .filter(col("n_domain_ok") * 100 >= lit(minPassPct) * col("n_domain_docs"))
    d.join(broadcast(domains), "reg_domain")
      .select(col(idCol), col("reg_domain"), (col("__ok") === 1).as("doc_keep"),
        col("n_domain_docs"), col("n_domain_ok"))
  }
}
