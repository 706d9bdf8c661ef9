package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's biggest dataflow — entry point B (SURVEY.md §3.2),
  * /root/reference/upload_data/Submissions/round3/make_round3_prediction_files.R
  * — as one lazy Catalyst plan. A reference user feeds the same ranked /
  * unranked prediction CSV shapes in and gets the same four tables out:
  * Predictions, Bad_Predictions, Prediction_Variants, Protein_Positions.
  */
object RefPipeline {

  /** COL_FUNCS cast registry — the reference's 17-entry mapping verbatim
    * (ref :29-46): RANK/SCORE/PEP_LEN as.integer; the four binding /
    * expression scores as.double; PROT_POS as.integer (the reference
    * applies it AFTER separate_rows, when the cell is a single position);
    * everything else as.character. Applied only to columns that exist
    * (mutate_col_if_exists, ref :192-214).
    */
  val colFuncs: Seq[(String, String)] = Seq(
    "RANK" -> "int",
    "HLA_ALLELE" -> "string",
    "ALT_EPI_SEQ" -> "string",
    "VAR_ID" -> "string",
    "SCORE" -> "int",
    "REF_EPI_SEQ" -> "string",
    "PEP_LEN" -> "int",
    "HLA_ALLELE_MUT" -> "string",
    "HLA_ALT_BINDING" -> "double",
    "HLA_REF_BINDING" -> "double",
    "REF_ALLELE_EXP" -> "double",
    "ALT_ALLELE_EXP" -> "double",
    "RANK_METRICS" -> "string",
    "RANK_DESC" -> "string",
    "ADDN_INFO" -> "string",
    "STEP_ID" -> "string",
    "PROT_POS" -> "int")

  /** Registry casts over whatever subset of columns exists. `skip` holds
    * columns whose cast must wait (PROT_POS while still ";"-delimited:
    * the reference only casts it once separate_rows has exploded it).
    */
  def convertDfToTypes(df: DataFrame, skip: Set[String] = Set.empty): DataFrame =
    df.select(df.columns.map { c =>
      colFuncs.collectFirst {
        case (n, t) if n == c && !skip.contains(c) => col(c).cast(t).as(c)
      }.getOrElse(col(c))
    }.toSeq: _*)

  /** check_columns (ref :217-223): abort with the missing names. */
  def checkColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"df has missing columns: ${missing.mkString(", ")}")
    df
  }

  /** format_epitopes (ref :185-189): uppercase, strip non-letters. */
  private def cleanEpitope(c: Column): Column =
    upper(regexp_replace(c, "[^A-Za-z]", ""))

  final case class PredictionTables(
      predictions: DataFrame,
      badPredictions: DataFrame,
      predictionVariants: DataFrame,
      proteinPositions: DataFrame)

  /** Build the four output tables for one submission batch.
    *
    * Input shape (ref REQ_RANKED_COLS/OPT_COLS): SUBMISSION_ID, SOURCE,
    * RANK (null on unranked rows), HLA_ALLELE, ALT_EPI_SEQ,
    * VAR_ID (":"-delimited multi), PROT_POS (";"-delimited multi), plus
    * optional scoring columns.
    */
  def predictionTables(ranked: DataFrame, unranked: DataFrame): PredictionTables = {
    // bind_rows (ref :157-161) — missing columns null-filled. PROT_POS is
    // still the ";"-delimited multi-cell here, so its integer cast waits
    // for the explode below (reference order: separate_rows first).
    val unioned = convertDfToTypes(
      ranked.unionByName(unranked, allowMissingColumns = true),
      skip = Set("PROT_POS"))
    checkColumns(unioned, Seq("SUBMISSION_ID", "SOURCE", "HLA_ALLELE",
      "ALT_EPI_SEQ", "VAR_ID", "PROT_POS"))

    // null filters + epitope cleanup (ref :160-165, :185-189)
    val cleaned = unioned
      .filter(col("HLA_ALLELE").isNotNull && col("ALT_EPI_SEQ").isNotNull)
      .withColumn("ALT_EPI_SEQ", cleanEpitope(col("ALT_EPI_SEQ")))

    // stable source-row lineage id (ref :144,153): per submission, ordered
    // by a total deterministic key — never monotonically_increasing_id.
    // The order spans EVERY column: (SOURCE, ALT_EPI_SEQ, HLA_ALLELE)
    // alone ties for the duplicate keys wBest exists to route, and a tie
    // makes both SOURCE_ROW_N and the winner/loser split run-dependent
    // (round-2 review); identical full rows are interchangeable, so the
    // all-column order is total where it matters
    val wRow = Window.partitionBy("SUBMISSION_ID")
      .orderBy(cleaned.columns.sorted.map(c => col(c).asc_nulls_last): _*)
    val numbered = cleaned
      .withColumn("SOURCE_ROW_N", row_number().over(wRow).cast("string"))

    // surrogate key (ref :176-181)
    val keyed = numbered.withColumn("PREDICTION_ID",
      concat_ws("_", col("SUBMISSION_ID"), col("SOURCE"),
        col("ALT_EPI_SEQ"), col("HLA_ALLELE")))

    // best-per-key + loser routing (W2, ref :92-103): best RANK wins,
    // losers go to Bad_Predictions
    val wBest = Window.partitionBy("SUBMISSION_ID", "SOURCE", "ALT_EPI_SEQ",
        "HLA_ALLELE")
      .orderBy(col("RANK").asc_nulls_last, col("SOURCE_ROW_N"))
    val rn = keyed.withColumn("_rn", row_number().over(wBest))
    val predictions = rn.filter(col("_rn") === 1).drop("_rn")
    val badPredictions = rn.filter(col("_rn") > 1).drop("_rn")

    // bridge tables: explode delimited multi-value cells (R1, ref :132-138)
    val predictionVariants = predictions
      .select(col("PREDICTION_ID"),
        explode(split(col("VAR_ID"), ":")).as("VAR_ID"))
      .withColumn("VARIANT_ID",
        concat_ws("_", col("PREDICTION_ID"), col("VAR_ID")))
    val proteinPositions = convertDfToTypes(predictions
      .filter(col("PROT_POS").isNotNull)
      .select(col("PREDICTION_ID"),
        explode(split(col("PROT_POS"), ";")).as("PROT_POS")))

    PredictionTables(
      predictions.drop("VAR_ID", "PROT_POS"),
      badPredictions.drop("VAR_ID", "PROT_POS"),
      predictionVariants,
      proteinPositions)
  }
}
