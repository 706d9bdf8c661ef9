package graft.sources

import scala.collection.mutable.ListBuffer

/** Parser for the reference's submission-document grammar — the real S7
  * (SURVEY.md §2.1): ONE nested YAML document fans out into TWO typed
  * tables, Steps and Parameters, with a per-key cast registry and the
  * `"null" → NA` vocabulary applied to the raw text BEFORE parsing
  * (ref: /root/reference/upload_data/Submissions/round3/
  * make_round3_yaml_files.R:45-90; COL_FUNCS registry :12-20;
  * param values-collapse :93-115).
  *
  * This is deliberately NOT a general YAML parser: it covers exactly the
  * two-level map + `key_parameters` list shape the reference consumes —
  *
  * {{{
  * step_name:
  *   used: true
  *   changed: null
  *   comment: free text
  *   key_parameters:
  *   - name: x
  *     value: 1.5
  *     unit: u
  *   - name: y
  *     values:
  *     - a
  *     - b
  *     relationship: in
  * }}}
  *
  * Cast registry (ref COL_FUNCS): used/changed → boolean, value → double,
  * name/comment/values/unit/relationship → string. A param's `values`
  * list is collapsed to a `;`-joined string per (name, relationship) —
  * the reference's unnest → group_by → str_c(collapse=";") pipeline.
  *
  * Used from Spark as a typed `flatMap` over `Dataset[(id, doc)]` (the
  * UDTF analog, SURVEY.md §2.12): parsing is per-row, embarrassingly
  * parallel, and the two outputs are independent lazy plans over the same
  * source.
  */
object YamlDoc {

  /** Steps-table row (ref steps_df: used/changed/comment + step + id). */
  final case class StepRow(
      submission_id: String,
      step: String,
      used: Option[Boolean],
      changed: Option[Boolean],
      comment: Option[String])

  /** Parameters-table row (ref parameters_df). */
  final case class ParamRow(
      submission_id: String,
      step: String,
      name: Option[String],
      value: Option[Double],
      values: Option[String],
      unit: Option[String],
      relationship: Option[String])

  private def kv(line: String): (String, String) = {
    val t = line.trim.stripPrefix("- ")
    val i = t.indexOf(':')
    if (i < 0) (t, "") else (t.take(i), t.drop(i + 1).trim)
  }

  private def opt(v: String): Option[String] =
    if (v.isEmpty || v == "NA") None else Some(v)

  def parse(submissionId: String, doc: String): (Seq[StepRow], Seq[ParamRow]) = {
    // the reference's null vocabulary: nulls become NA before the parse
    // (readLines %>% str_replace_all("null", "NA"))
    val lines = doc.split("\n").toList
      .map(_.replace("null", "NA"))
      .filterNot(_.trim.isEmpty)

    // split into top-level step blocks
    val blocks = ListBuffer[(String, List[String])]()
    var curName: String = null
    var curBody = ListBuffer[String]()
    for (l <- lines) {
      if (!l.startsWith(" ")) {
        if (curName != null) blocks += ((curName, curBody.toList))
        curName = l.trim.stripSuffix(":")
        curBody = ListBuffer()
      } else if (curName != null) curBody += l
    }
    if (curName != null) blocks += ((curName, curBody.toList))

    val steps = blocks.toList.map { case (name, body) =>
      // step scalars live at indent 2 and are never list items
      def field(k: String): Option[String] = body.collectFirst {
        case l if l.startsWith("  ") && !l.startsWith("   ") &&
          !l.startsWith("  - ") && kv(l)._1 == k => kv(l)._2
      }.flatMap(opt)
      StepRow(submissionId, name,
        field("used").map(_.toBoolean),
        field("changed").map(_.toBoolean),
        field("comment"))
    }

    val params = blocks.toList.flatMap { case (name, body) =>
      val kp = body.dropWhile(_.trim != "key_parameters:")
      val items = ListBuffer[ParamRow]()
      var fields = Map.empty[String, String]
      var vals = ListBuffer[String]()
      var inVals = false
      var started = false
      def flush(): Unit = if (started) {
        def g(k: String) = fields.get(k).flatMap(opt)
        items += ParamRow(submissionId, name, g("name"),
          g("value").map(_.toDouble),
          // unnest → collapse with ";" per param (ref param_list_to_df)
          if (vals.nonEmpty) Some(vals.mkString(";")) else None,
          g("unit"), g("relationship"))
      }
      if (kp.nonEmpty) kp.drop(1).foreach { l =>
        if (l.startsWith("  - ")) { // new param object
          flush()
          val (k, v) = kv(l)
          // `- values:` as the FIRST line of a param object opens the
          // list too — only the continuation branch handled it before,
          // silently dropping such a param's items (round-2 review)
          inVals = k == "values" && v.isEmpty
          fields = if (inVals) Map.empty else Map(k -> v)
          vals = ListBuffer(); started = true
        } else if (l.startsWith("    - ")) { // values-list item
          if (inVals) vals += l.trim.stripPrefix("- ").trim
        } else if (l.startsWith("    ") && started) {
          val (k, v) = kv(l)
          if (k == "values" && v.isEmpty) inVals = true
          else { inVals = false; fields += (k -> v) }
        }
      }
      flush()
      items.toList
    }

    (steps, params)
  }
}
