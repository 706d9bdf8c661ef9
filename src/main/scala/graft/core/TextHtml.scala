package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic html ↔ text transforms, built entirely from codegen'd
  * Catalyst expressions (no UDFs in the hot path — SURVEY.md §7.3).
  *
  * The north-star invariant is "byte-identical extracted text per url":
  * `extractText(htmlify(text)) === text` must hold bit-for-bit, and
  * extraction must be a pure function of the html bytes, so replay always
  * reconverges (SURVEY.md §7.4 #2).
  */
object TextHtml {

  /** Escape the three html-significant chars (order matters: & first). */
  private def esc(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "&", "&amp;"),
        "<", "&lt;"),
      ">", "&gt;")

  private def unesc(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")

  /** Deterministic page markup around a text payload → BINARY html. */
  def htmlify(text: Column, url: Column): Column =
    concat(
      lit("<html><head><title>"), esc(url), lit("</title></head><body><p>"),
      esc(text), lit("</p></body></html>")).cast("binary")

  /** Inverse: decode bytes, take the <p> body, strip tags, unescape.
    * Pure function of the html bytes — whole-stage-codegen friendly.
    */
  def extractText(html: Column): Column = {
    val s = html.cast("string")
    val body = regexp_extract(s, "(?s)<p>(.*)</p>", 1)
    unesc(regexp_replace(body, "<[^>]*>", ""))
  }

  /** Deterministic language tag from the url's domain (payload metadata;
    * generator-side only).
    */
  def langOf(hash: Column): Column = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    element_at(array(langs.map(lit): _*), (pmod(hash, lit(langs.size)) + 1).cast("int"))
  }
}
