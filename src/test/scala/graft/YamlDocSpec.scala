package graft

import graft.sources.YamlDoc
import graft.sources.YamlDoc.{ParamRow, StepRow}
import org.scalatest.funsuite.AnyFunSuite

/** Golden test of the S7 nested-document fan-out on a reference-shaped
  * fixture (the document grammar of
  * /root/reference/upload_data/Submissions/round3/make_round3_yaml_files.R:45-90).
  */
class YamlDocSpec extends AnyFunSuite {

  private val fixture =
    """alignment:
      |  used: true
      |  changed: null
      |  comment: ran with defaults
      |  key_parameters:
      |  - name: threshold
      |    value: 1.5
      |    unit: score
      |  - name: callers
      |    values:
      |    - mutect
      |    - strelka
      |    - varscan
      |    relationship: union
      |ranking:
      |  used: false
      |  changed: true
      |  comment: null
      |filtering:
      |  used: null
      |  changed: false
      |  comment: NA
      |  key_parameters:
      |  - name: min_depth
      |    value: 10.0
      |""".stripMargin

  test("one document fans out into typed Steps + Parameters tables") {
    val (steps, params) = YamlDoc.parse("sub-1", fixture)

    assert(steps === Seq(
      StepRow("sub-1", "alignment", Some(true), None, Some("ran with defaults")),
      StepRow("sub-1", "ranking", Some(false), Some(true), None),
      StepRow("sub-1", "filtering", None, Some(false), None)))

    assert(params === Seq(
      ParamRow("sub-1", "alignment", Some("threshold"), Some(1.5), None,
        Some("score"), None),
      ParamRow("sub-1", "alignment", Some("callers"), None,
        Some("mutect;strelka;varscan"), None, Some("union")),
      ParamRow("sub-1", "filtering", Some("min_depth"), Some(10.0), None,
        None, None)))
  }

  test("the null vocabulary applies to raw text before parsing") {
    // a literal "null" scalar anywhere becomes NA → typed None, exactly
    // like the reference's readLines %>% str_replace_all("null", "NA")
    val (steps, _) = YamlDoc.parse("s", "x:\n  used: null\n  comment: null\n")
    assert(steps === Seq(StepRow("s", "x", None, None, None)))
    // the replacement is RAW-TEXT (str_replace_all), not YAML-aware: a
    // "null" embedded in a longer scalar is rewritten too — an input a
    // plain YAML parser would leave as-is, so removing the pre-parse
    // replacement fails here (round-2 test review)
    val (steps2, _) = YamlDoc.parse("s", "x:\n  comment: nullable idea\n")
    assert(steps2.head.comment === Some("NAable idea"))
  }

  test("a step without key_parameters contributes no parameter rows") {
    val (_, params) = YamlDoc.parse("s", "x:\n  used: true\n")
    assert(params.isEmpty)
  }
}
