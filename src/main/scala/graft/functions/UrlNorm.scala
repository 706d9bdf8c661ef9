package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for the CDC key domain. The engine keys web pages
  * by `url` (BASELINE input_hint), so two crawls of the same page must
  * normalize to one key BEFORE dedup/merge — otherwise the lake stores
  * near-duplicate rows per casing/tracking-param variant of a URL.
  * (Reference analog: filename-keyed joins normalize case/suffix first,
  * e.g. upload_data/Submissions/round1/upload_round1_variants.R:92-106.)
  *
  * Pure built-in expression composition — whole-stage codegen, no UDF;
  * every step is also expressible in the DuckDB oracle dialect (no
  * replacement backreferences, RE2-safe patterns).
  */
object UrlNorm {

  /** Canonical form: fragment dropped; scheme+authority lowercased (path
    * stays case-sensitive per RFC 3986); the scheme's DEFAULT port
    * dropped from the authority only (https:443, http:80 — a ':80/' in
    * the PATH is a legal path character sequence and survives, as does a
    * non-default https://host:8080 or http://host:443); utm_* tracking
    * params dropped only at parameter boundaries ('?'/'&'-anchored, so
    * '?autm_source=1' is a different page and survives); dangling
    * '?'/'&' and trailing slashes trimmed.
    */
  def normalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val auth = lower(regexp_extract(noFrag, "^([^/]*//[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^/]*//[^/?#]*", "")
    // port strip is authority-anchored AND scheme-aware
    val authNoPort =
      when(auth.startsWith("https://"), regexp_replace(auth, ":443$", ""))
        .when(auth.startsWith("http://"), regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    val lowered = concat(authNoPort, rest)
    // tracking params only at a real parameter boundary: first every
    // '&utm_...' (cannot be the first param), then a leading '?utm_...'
    // keeping the '?' for any params that follow it
    val noTrack = regexp_replace(
      regexp_replace(lowered, "&utm_[a-z]+=[^&#]*", ""),
      "\\?utm_[a-z]+=[^&#]*&?", "?")
    // trailing-slash trim must stay PATH-anchored: collapse slashes that
    // sit directly before the query, then strip end-of-string slashes
    // only when no query remains — '?next=/home/' is a VALUE whose slash
    // distinguishes pages (round-2 review)
    val cleaned = regexp_replace(
      regexp_replace(noTrack, "/+\\?", "?"), "[?&]+$", "")
    when(cleaned.contains("?"), cleaned)
      .otherwise(regexp_replace(cleaned, "/+$", ""))
  }
}
