package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One source column renamed (or coalesced) into one target column. */
final case class Rename(source: String, target: String)

/** A custom per-column transform: `(sourceCol, targetName) => Column`.
  * The reference models these as SQL-template lambdas
  * (`core/constants.py:157-186`); here they are Column builders. */
final case class CustomTransform(source: String, target: String, build: (String, String) => Column)

/** Configuration constants ported from the reference
  * (`/root/reference/core/constants.py`). Values are data, not code —
  * they drive the pure planning layer in [[graft.naming.Naming]] and the
  * transforms in [[graft.transform]]. */
object Constants {

  /** Ref: `core/constants.py:21`. */
  val AllowedNonCidVariableNamesLower: Set[String] = Set("connect_id")

  /** Ref: `core/constants.py:24-25` (membership tested case-insensitively). */
  val ForbiddenNonCidVariableNames: Seq[String] = Seq(
    "token", "uid", "date", "sha", "siteAcronym", "utm_source", "verifiedSeen",
    "id", "pin", "state_studyId", "state_uid", "firstSurveyCompletedSeen")
  val ForbiddenNonCidVariableNamesLower: Set[String] =
    ForbiddenNonCidVariableNames.map(_.toLowerCase).toSet

  /** Substrings deleted from names; order matters. Ref: `core/constants.py:28`. */
  val SubstringsToFix: Seq[String] = Seq("_num", "state_")

  /** Ref: `core/constants.py:31`. */
  val AllowedNonCidSubstringsLower: Set[String] = Set("num", "state")

  /** Ref: `core/constants.py:34` + `:37-41` combined per `:44-47`. */
  val SubstringsDatatypeConflict: Seq[String] = Seq("provided", "string", "integer", "entity")
  val SubstringsMisnamed: Seq[String] = Seq(
    "sibcanc3d", "chol", "momcanc3d", "sibcanc3o", "uf", "dadcanc3k", "bloodclot", "depress2",
    "htn", "append", "tublig", "tonsils", "breastdis", "dm2", "20required")
  val ExcludedNonCidSubstrings: Seq[String] = SubstringsDatatypeConflict ++ SubstringsMisnamed

  /** "False array" literal domain. Ref: `core/constants.py:55-59`. */
  val FalseArrayValues: Seq[String] = Seq("[]", "[178420302]", "[958239616]")

  /** Ref: `core/constants.py:67`. */
  val BracketedNineDigitPattern: String = "^\\[\\d{9}\\]$"

  /** Binary 0/1 → concept-ID recode targets. Ref: `core/utils.py:459-466`,
    * `README.md:55`. */
  val CidYes = "353358909"
  val CidNo = "104430631"

  /** Table-specific one-off renames. Ref: `core/constants.py:76-153`. */
  val OneOffColumnRenameMappings: Map[String, Seq[Rename]] = Map(
    "FlatConnect.module1_v1_JP" -> Seq(
      Rename("D_122887481_TUBLIG_D_232595513", "d_122887481_d_623218391"),
      Rename("D_122887481_TUBLIG_D_614366597", "d_122887481_d_802622485"),
      Rename("D_259089008_1_1_SIBCANC3O_D_230633094_1", "d_259089008_d_206625031_1"),
      Rename("D_259089008_1_1_SIBCANC3O_D_962468280_1", "d_259089008_d_261863326_1"),
      Rename("D_301414575_DEPRESS2_D_479548517", "d_301414575_d_261863326"),
      Rename("D_301414575_DEPRESS2_D_591959654", "d_301414575_d_206625031"),
      Rename("D_301679110_DM2_D_166195719", "d_301679110_d_261863326"),
      Rename("D_301679110_DM2_D_861769692", "d_301679110_d_206625031"),
      Rename("D_355472178_BREASTDIS_D_138780721", "d_619481697_d_261863326"),
      Rename("D_355472178_BREASTDIS_D_162512268", "d_619481697_d_206625031"),
      Rename("D_367884741_TONSILS_D_300754548", "d_367884741_d_623218391"),
      Rename("D_367884741_TONSILS_D_714712574", "d_367884741_d_802622485"),
      Rename("D_370198527_DADCANC3K_D_260972338", "d_370198527_d_206625031"),
      Rename("D_370198527_DADCANC3K_D_331562964", "d_370198527_d_261863326"),
      Rename("D_402548942_MOMCANC3D_D_388289687", "d_402548942_d_206625031"),
      Rename("D_402548942_MOMCANC3D_D_734800333", "d_402548942_d_261863326"),
      Rename("D_460062034_BLOODCLOT_D_497018554", "d_460062034_d_206625031"),
      Rename("D_460062034_BLOODCLOT_D_694594047", "d_460062034_d_261863326"),
      Rename("D_550075233_APPEND_D_727704681", "d_550075233_d_802622485"),
      Rename("D_550075233_APPEND_D_919193251", "d_550075233_d_623218391"),
      Rename("D_836890480_CHOL_D_470282814", "d_836890480_d_261863326"),
      Rename("D_836890480_CHOL_D_637556277", "d_836890480_d_206625031"),
      Rename("D_846786840_UF_D_351965599", "d_846786840_d_261863326"),
      Rename("D_846786840_UF_D_895115511", "d_846786840_d_206625031"),
      Rename("D_884793537_HTN_D_367670682", "d_884793537_d_206625031"),
      Rename("D_884793537_HTN_D_608469482", "d_884793537_d_261863326"),
      Rename("D_907590067_4_4_SIBCANC3O_D_650332509_4", "d_907590067_d_261863326_4"),
      Rename("D_907590067_4_4_SIBCANC3D_D_932489634_4", "d_907590067_d_206625031_4"),
      Rename("D_150352141_D_206625031", "d_150352141_d_623218391"),
      Rename("D_150352141_D_261863326", "d_150352141_d_802622485"),
      Rename("D_122887481_D_206625031", "d_122887481_d_623218391"),
      Rename("D_122887481_D_261863326", "d_122887481_d_802622485"),
      Rename("D_534007917_D_206625031", "d_534007917_d_623218391"),
      Rename("D_534007917_D_261863326", "d_534007917_d_802622485"),
      Rename("D_752636038_D_206625031", "d_752636038_d_623218391"),
      Rename("D_752636038_D_261863326", "d_752636038_d_802622485"),
      Rename("D_518750011_D_206625031", "d_518750011_d_623218391"),
      Rename("D_518750011_D_261863326", "d_518750011_d_802622485"),
      Rename("D_275770221_D_206625031", "d_275770221_d_623218391"),
      Rename("D_275770221_D_261863326", "d_275770221_d_802622485"),
      Rename("D_527057404_D_206625031", "d_527057404_d_623218391"),
      Rename("D_527057404_D_261863326", "d_527057404_d_802622485")),
    "FlatConnect.module1_v2_JP" -> Seq(
      Rename("D_150352141_D_206625031", "d_150352141_d_623218391"),
      Rename("D_150352141_D_261863326", "d_150352141_d_802622485"),
      Rename("D_122887481_D_206625031", "d_122887481_d_623218391"),
      Rename("D_122887481_D_261863326", "d_122887481_d_802622485"),
      Rename("D_534007917_D_206625031", "d_534007917_d_623218391"),
      Rename("D_534007917_D_261863326", "d_534007917_d_802622485"),
      Rename("D_752636038_D_206625031", "d_752636038_d_623218391"),
      Rename("D_752636038_D_261863326", "d_752636038_d_802622485"),
      Rename("D_518750011_D_206625031", "d_518750011_d_623218391"),
      Rename("D_518750011_D_261863326", "d_518750011_d_802622485"),
      Rename("D_275770221_D_206625031", "d_275770221_d_623218391"),
      Rename("D_275770221_D_261863326", "d_275770221_d_802622485"),
      Rename("D_527057404_D_206625031", "d_527057404_d_623218391"),
      Rename("D_527057404_D_261863326", "d_527057404_d_802622485")),
    "FlatConnect.covid19Survey_v1_JP" -> (1 to 10).map(n =>
      Rename(s"d_71558179_v2_${n}_$n", s"d_715581797_${n}_v2"))
  )

  /** Age: keep 1-3 digit values in [0, 125] as INT64, else NULL.
    * Ref: `core/constants.py:160-171`. The cast sits inside the
    * regex-guarded branch so ANSI mode never sees a malformed cast. */
  def ageTransform(source: String, target: String): Column =
    when(col(source).rlike("^\\d{1,3}$"),
      when(col(source).cast(LongType).between(0, 125), col(source).cast(LongType))
        .otherwise(lit(null).cast(LongType)))
      .otherwise(lit(null).cast(LongType))

  /** Year: keep exactly-4-digit values as INT64, else NULL.
    * Ref: `core/constants.py:173-183`. */
  def yearTransform(source: String, target: String): Column =
    when(col(source).rlike("^\\d{4}$"), col(source).cast(LongType))
      .otherwise(lit(null).cast(LongType))

  /** Ref: `core/constants.py:157-186`. Targets keep their original case
    * (SURVEY §2.C-4). */
  val CustomTransforms: Map[String, Seq[CustomTransform]] = Map(
    "FlatConnect.module1_v2_JP" -> Seq(
      CustomTransform("D_317093647", "D_317093647_D_623218391", ageTransform),
      CustomTransform("D_317093647", "D_317093647_D_802622485", yearTransform)))

  /** Precomputed false-array concept-ID pairs. Ported from the reference's
    * statistics sidecar `reference/false_array_columns.json:9-85` (75 pairs;
    * every pair is self-paired in the current file). */
  val FalseArrayConceptIdPairs: Seq[(String, String)] = Seq(
    "236590500", "537137982", "640010727", "869387390", "178774803", "354326265",
    "422714611", "628078826", "578895128", "273218182", "438682764", "550092533",
    "618427836", "596961796", "646042915", "753610471", "753416375", "825189914",
    "803968511", "799338907", "901498441", "893965588", "991622246", "276575533",
    "517100968", "585819411", "933417196", "123104885", "116032363", "173413183",
    "212343294", "205492848", "200086909", "201906316", "192184336", "194944818",
    "216096388", "264797252", "263588196", "268612977", "255474241", "293954660",
    "298296694", "355179190", "370121390", "350394531", "398762737", "440597740",
    "443679537", "469914719", "444145120", "508587741", "509526051", "558981691",
    "581231591", "564684946", "657986901", "668887646", "733317111", "746604821",
    "757983656", "752101258", "763354979", "787064287", "804504024", "845811202",
    "890661849", "879180101", "864213677", "878688378", "920576363", "902193418",
    "961572487", "964853797", "986316055").map(cid => (cid, cid))

  /** Fixed PII-tier projection. Ref: `core/transformations.py:793-796`. */
  val SensitiveTierColumns: Seq[String] = Seq(
    "CONNECT_ID", "d_849518448", "d_684926335", "d_253532712", "d_119643471",
    "d_706256705", "d_435027713", "d_827220437", "d_699625233", "d_919254129",
    "d_558435199", "d_878865966", "d_684635302", "d_167958071", "d_949302066",
    "d_536735468", "d_663265240", "d_976570371")
}
