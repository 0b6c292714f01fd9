package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus ingest operators: URL canonicalization and domain
  * extraction — the normalization a crawl pipeline applies BEFORE url
  * dedup, blocklist joins and per-domain caps (a raw crawl carries the
  * same page under case variants, default ports, tracking params,
  * fragments and shuffled query strings; deduplicating raw URLs
  * under-merges by 2-5× on real crawls).
  *
  * Everything is pure codegen'd string/regex column algebra — row-local,
  * fuses with the scan, zero shuffle — and deliberately engine-portable
  * (the same regex/list operations exist in the oracle engine, so the
  * whole normalization is value-gated, not spot-checked). */
object Web {

  /** Canonical URL form:
    *  - scheme and host lowercased;
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - fragment dropped;
    *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`);
    *  - remaining query params sorted (byte order);
    *  - empty path normalized to `/`.
    * The rules every crawl stack converges on (cf. RFC 3986 §6
    * normalization + the de-facto tracking-param strip). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val noFrag = regexp_replace(regexp_replace(u, "^[A-Za-z]+://", ""), "#.*$", "")
    val hostport = lower(regexp_extract(noFrag, "^([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path = regexp_extract(noFrag, "^[^/?]+(/[^?]*)?", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !p.rlike("^(utm_[^=]*|gclid|fbclid)=") && length(p) > 0)
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Naive registrable domain: the last two dot-labels of the canonical
    * host (example.com from www.example.com) — the per-domain-cap /
    * blocklist key. A production stack substitutes the public-suffix
    * list; the JOIN SHAPE (tiny domain table broadcast into the corpus)
    * is identical. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
