package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative tag-remap projection (P6) — the reference applies these
  * constantly to re-target label sets: `somenlp/NER/data_handler.py:85-97`
  * (`_adjust_tag`: split off the `B-`/`I-` prefix, map the name through a
  * JSON transform, re-attach the prefix; `O` is a fixed point; a remap to
  * `O` drops the prefix entirely) over the 10 transform tables under
  * `configurations/data_transforms/` (shipped below as data).
  *
  * Unknown tag names raise, matching the Python `KeyError`.
  */
object TagRemap {

  /** `_adjust_tag` (data_handler.py:85-97). */
  def remapTag(tag: String, mapping: Map[String, String]): String = {
    if (tag == "O") return tag
    val dash = tag.indexOf('-')
    require(dash > 0, s"not a BIO tag: '$tag'")
    val prefix = tag.substring(0, dash)
    val name = tag.substring(dash + 1)
    val mapped = mapping.getOrElse(name,
      throw new NoSuchElementException(s"tag name '$name' not in transform"))
    if (mapped == "O") "O" else s"$prefix-$mapped"
  }

  /** Remap a whole tag sequence (one row's BIO layer). */
  def remapSeq(tags: Seq[String], mapping: Map[String, String]): Seq[String] =
    tags.map(remapTag(_, mapping))

  /** Column form for an `array<string>` BIO column: broadcast-free map
    * literal + `transform()` — stays in codegen, no UDF. Missing names map
    * to an explicit error marker so silent drops can't slip through (the
    * relational equivalent of the KeyError).
    */
  def remapColumn(tagsCol: Column, mapping: Map[String, String]): Column = {
    val m = typedLit(mapping)
    transform(tagsCol, t => {
      val dash = instr(t, "-")
      // everything after the FIRST dash — `_adjust_tag` splits at the first
      // dash, so a type name that itself contains dashes ("B-Foo-Bar" →
      // "Foo-Bar") must stay intact (substring_index(…,-1) would keep only
      // the text after the LAST dash — ADVICE r02)
      val name = substr(t, dash + 1, length(t))
      val prefix = substr(t, lit(1), dash) // includes the '-'
      val mapped = element_at(m, when(dash > 0, name).otherwise(t))
      when(t === "O", lit("O"))
        .when(mapped.isNull, lit("<<UNMAPPED>>"))
        .when(mapped === "O", lit("O"))
        .otherwise(concat(prefix, mapped))
    })
  }

  /** Scalar (prefix-less) form for mention/relation LABEL columns. */
  def remapLabel(labelCol: Column, mapping: Map[String, String]): Column =
    coalesce(element_at(typedLit(mapping), labelCol), lit("<<UNMAPPED>>"))

  // ---------------------------------------------------------------------------
  // The 10 SoMeSci transform tables (configurations/data_transforms/),
  // verbatim. The tag tables share one 23-name key set (1 'O' + 13 combined
  // type_mention names + 9 attributes — counted against the reference
  // JSONs; an earlier comment said 26, round-5 review) and the relation
  // tables one 11-name key set.
  // ---------------------------------------------------------------------------

  private val SoftTypes = Seq("Application", "PlugIn", "ProgrammingEnvironment", "OperatingSystem")
  private val MentionTypesOf = Map(
    "Application" -> Seq("Creation", "Deposition", "Usage", "Mention"),
    "PlugIn" -> Seq("Creation", "Deposition", "Usage", "Mention"),
    "ProgrammingEnvironment" -> Seq("Usage", "Mention"),
    "OperatingSystem" -> Seq("Usage", "Mention"))
  private val Combined: Seq[String] =
    SoftTypes.flatMap(s => MentionTypesOf(s).map(m => s"${s}_$m")) :+ "SoftwareCoreference_Deposition"
  private val Attrs = Seq("Version", "Developer", "URL", "License", "Citation",
    "Abbreviation", "AlternativeName", "Release", "Extension")
  val RelationNames: Seq[String] = Seq("Version_of", "Developer_of", "URL_of", "License_of",
    "Citation_of", "Abbreviation_of", "AlternativeName_of", "Release_of", "Specification_of",
    "PlugIn_of", "Extension_of")

  private def table(combined: String => String, attr: String => String): Map[String, String] =
    (Map("O" -> "O")
      ++ Combined.map(c => c -> combined(c))
      ++ Attrs.map(a => a -> attr(a)))

  private def softOf(c: String) = c.split("_")(0)
  private def mentionOf(c: String) = c.split("_")(1)

  /** SoMeSci_software.json: every software mention → Application, attrs → O. */
  val Software: Map[String, String] = table(_ => "Application", _ => "O")

  /** SoMeSci_soft_type.json: soft type kept, attrs → O. */
  val SoftType: Map[String, String] = table(c => softOf(c), _ => "O")

  /** SoMeSci_mention_type.json: mention type kept, attrs → O. */
  val MentionType: Map[String, String] = table(c => mentionOf(c), _ => "O")

  /** SoMeSci_add_info.json: software → O, attrs kept. */
  val AddInfo: Map[String, String] = table(_ => "O", a => a)

  /** SoMeSci_soft_add_info.json: software → Application, attrs kept. */
  val SoftAddInfo: Map[String, String] = table(_ => "Application", a => a)

  /** SoMeSci_soft_relations.json: soft type kept AND attrs kept. */
  val SoftRelations: Map[String, String] = table(c => softOf(c), a => a)

  /** SoMeSci_keep_all.json / SoMeSci_soft_mention_type.json: identity on
    * combined labels; keep_all also keeps attrs, soft_mention_type drops
    * them.
    */
  val KeepAll: Map[String, String] = table(c => c, a => a)
  val SoftMentionType: Map[String, String] = table(c => c, _ => "O")

  /** SoMeSci_relations.json = SoMeSci_keep_relations.json: identity. */
  val Relations: Map[String, String] = RelationNames.map(r => r -> r).toMap
  val KeepRelations: Map[String, String] = Relations

  /** All ten, by reference file name. */
  val ByName: Map[String, Map[String, String]] = Map(
    "SoMeSci_software" -> Software,
    "SoMeSci_soft_type" -> SoftType,
    "SoMeSci_mention_type" -> MentionType,
    "SoMeSci_add_info" -> AddInfo,
    "SoMeSci_soft_add_info" -> SoftAddInfo,
    "SoMeSci_soft_relations" -> SoftRelations,
    "SoMeSci_soft_mention_type" -> SoftMentionType,
    "SoMeSci_keep_all" -> KeepAll,
    "SoMeSci_relations" -> Relations,
    "SoMeSci_keep_relations" -> KeepRelations)
}
