package graft.ops

import org.apache.spark.sql.functions._

/** Training-data text-analysis operators over the `documents` table:
  * token counting, quality scoring, fingerprinting, language-ID. All
  * codegen-friendly built-in expressions — no UDFs in the hot path.
  */
object TextQueries {

  import Tables.tbl

  /** Stopword lists per language for the n-gram/stopword langid heuristic.
    * Tiny on purpose: broadcast-literal sized, deterministic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "no"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  def defs: Seq[QueryDef] = Seq(

    // token counting: whitespace tokenization (BPE-ish regex split)
    QueryDef(
      "t1_token_count",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("n_tokens"),
            length(col("text")).as("len_chars"),
            col("n_chars")),
      Some("""SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |       length(text) AS len_chars, n_chars
             |FROM documents""".stripMargin)),

    // quality scoring: length / punctuation / stopword ratios
    QueryDef(
      "t2_quality_score",
      (s, dir) => {
        // \s+ tokenizer — unified with t1/t9/d2 so a user combining text
        // ops gets ONE token count per document (round-2 verdict #9)
        val toks = split(trim(col("text")), "\\s+")
        val en = TextQueries.stopwords("en")
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            length(col("text")).as("len"),
            round(length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
              / length(col("text")).cast("double"), 4).as("punct_ratio"),
            round(size(filter(toks, t => t.isin(en: _*)))
              / size(toks).cast("double"), 4).as("stopword_ratio"))
      },
      Some(s"""SELECT doc_id, length(text) AS len,
              |  round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
              |        / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
              |  round(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |            t -> t IN (${TextQueries.stopwords("en").map("'" + _ + "'").mkString(",")})))
              |        / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 4) AS stopword_ratio
              |FROM documents""".stripMargin)),

    // corpus vocabulary top-k: explode tokens → hash-agg count → top 20
    // (vocab building for tokenizer training; partial-agg'd one shuffle,
    // then TakeOrderedAndProject — no global sort materializes)
    QueryDef(
      "t9_vocab_topk",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token"))
          .limit(20),
      Some("""SELECT token, count(*) AS freq
             |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |      FROM documents)
             |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin)),

    // repetition ratio (Gopher-style quality signal): fraction of word
    // 2-grams that are repeats of an earlier 2-gram in the same document
    // — high values flag boilerplate/spam for training-data filtering.
    // Pure expressions over a materialized token array (interpreted-HOF
    // discipline), no shuffle.
    QueryDef(
      "t10_repetition_ratio",
      (s, dir) =>
        Tables.tblSpread(s, dir, "documents", "doc_id")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
          .select(col("doc_id"),
            when(size(col("toks")) >= 2,
              transform(sequence(lit(0), size(col("toks")) - 2), i =>
                concat_ws(" ", element_at(col("toks"), i + 1),
                  element_at(col("toks"), i + 2))))
              .otherwise(array().cast("array<string>")).as("bigrams"))
          .select(col("doc_id"),
            size(col("bigrams")).as("n_bigrams"),
            when(size(col("bigrams")) > 0,
              round(lit(1.0) - size(array_distinct(col("bigrams")))
                / size(col("bigrams")).cast("double"), 4))
              .otherwise(lit(0.0)).as("repetition_ratio")),
      Some("""SELECT doc_id, len(bigrams) AS n_bigrams,
             |  CASE WHEN len(bigrams) > 0
             |       THEN round(1.0 - len(list_distinct(bigrams))
             |                  / CAST(len(bigrams) AS DOUBLE), 4)
             |       ELSE 0.0 END AS repetition_ratio
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 2
             |         THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
             |         ELSE [] END AS bigrams
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |        FROM documents))""".stripMargin)),

    // document fingerprinting: md5 over whitespace-normalized lowercase text
    QueryDef(
      "t3_fingerprint",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp")),
      Some("""SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
             |FROM documents""".stripMargin)),

    // language-ID: stopword-hit voting, argmax over languages (deterministic
    // tie-break by language code). Pure expressions → whole-stage codegen.
    QueryDef(
      "t4_lang_id",
      (s, dir) => {
        // same unified \s+ tokenizer as t1/t2/t9/d2 (round-2 verdict #9)
        val toks = split(trim(lower(col("text"))), "\\s+")
        val scored = tbl(s, dir, "documents")
          .select(col("doc_id") +: col("lang").as("true_lang") +:
            TextQueries.stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
              size(filter(toks, t => t.isin(ws: _*))).as(s"sc_$l")
            }: _*)
        val langs = TextQueries.stopwords.keys.toSeq.sorted
        // argmax via greatest + chained when (first lang in sorted order wins ties)
        val maxSc = greatest(langs.map(l => col(s"sc_$l")): _*)
        val pred = langs.foldRight(lit("und")) { (l, acc) =>
          when(col(s"sc_$l") === maxSc && maxSc > 0, lit(l)).otherwise(acc)
        }
        scored.select(col("doc_id"), col("true_lang"), pred.as("pred_lang"))
      },
      Some {
        val langs = TextQueries.stopwords.keys.toSeq.sorted
        val scores = langs.map { l =>
          val ws = TextQueries.stopwords(l).map("'" + _ + "'").mkString(",")
          s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ($ws))) AS sc_$l"
        }.mkString(",\n  ")
        val maxSc = s"greatest(${langs.map(l => s"sc_$l").mkString(",")})"
        val pred = langs.foldRight("'und'") { (l, acc) =>
          s"CASE WHEN sc_$l = $maxSc AND $maxSc > 0 THEN '$l' ELSE $acc END"
        }
        s"""SELECT doc_id, true_lang, $pred AS pred_lang FROM (
           |  SELECT doc_id, lang AS true_lang,
           |  $scores
           |  FROM documents)""".stripMargin
      })
  )
}
