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
    * stays case-sensitive per RFC 3986); default ports 80/443 dropped;
    * utm_* tracking params dropped; dangling '?'/'&' and trailing
    * slashes trimmed.
    */
  def normalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[^/]*//[^/?#]*", ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, ":(443|80)/", "/"), ":(443|80)$", "")
    val noTrack = regexp_replace(noPort, "utm_[a-z]+=[^&#]*&?", "")
    regexp_replace(regexp_replace(noTrack, "[?&]+$", ""), "/+$", "")
  }
}
