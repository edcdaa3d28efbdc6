package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalizer in front of URL-keyed dedup and
  * the resume anti-join (two spellings of one URL otherwise double-crawl
  * and double-store). Deliberately a PURE Column expression: it compiles
  * into whole-stage codegen next to the scan, so canonicalizing 10^12 urls
  * costs no UDF boundary and no extra stage.
  *
  * Canonical form (RFC 3986 §6 normalizations that preserve identity):
  *   - scheme and host lowercased (case-insensitive by spec)
  *   - default port dropped (:80 for http, :443 for https), others kept
  *   - empty path → "/"
  *   - query preserved byte-for-byte (reordering params changes identity)
  *   - fragment dropped (never sent to the server)
  *
  * NOT done (identity-changing, documented): www-stripping, percent-decode,
  * dot-segment resolution, param sorting.
  */
object UrlOps {

  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^[^:/?#]+://([^/:?#]+)", 1))

  def urlPort(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/:?#]+:([0-9]+)", 1)

  def urlPath(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#]+([^?#]*)", 1)

  def urlQuery(u: Column): Column =
    regexp_extract(u, "^[^?#]*(\\?[^#]*)", 1)

  def canonicalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = urlPath(u)
    val pathPart = when(path === "", lit("/")).otherwise(path)
    concat(scheme, lit("://"), host, portPart, pathPart, urlQuery(u))
  }
}
