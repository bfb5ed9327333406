package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the governance pass every training corpus
  * runs before anything else sees the text.
  *
  * A rule is (name, regex, replacement); [[redact]] applies the rules in
  * order, counting matches per rule per row before each replacement, so the
  * output carries both the scrubbed text and an auditable per-rule tally.
  * Everything is `regexp_count`/`regexp_replace` — codegen'd string
  * expressions, one projection, no UDF, no shuffle: at 100 TB this is a
  * map-only pass that scales linearly with zero network cost.
  *
  * Rule order matters and is part of the contract: an earlier rule's
  * replacement token must not re-match a later rule (e.g. redact emails
  * before bare digit-runs, with letter-only placeholders).
  *
  * The default pack sticks to constructs with identical semantics in Java
  * regex and RE2 (character classes, bounded repetition, `\b`), so the same
  * patterns run on the DuckDB oracle side verbatim.
  */
object Redaction {

  final case class Rule(name: String, pattern: String, replacement: String)

  /** Email, IPv4, long digit-run (account/ID-number shaped): the minimal
    * pack a text corpus ships with. Order: emails first (they contain
    * digits), then dotted quads, then bare runs. */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+""", "<EMAIL>"),
    Rule("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    Rule("idnum", """\b\d{8,}\b""", "<ID>"))

  /** Apply `rules` in order to `textCol`: adds one `n_<rule>` match-count
    * column per rule (counted against the text as that rule sees it, i.e.
    * after earlier rules ran) and `<textCol>_redacted` with all rules
    * applied. */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame = {
    val start: (DataFrame, Column) = (df, col(textCol))
    val (out, redacted) = rules.foldLeft(start) { case ((d, t), r) =>
      (d.withColumn(s"n_${r.name}", regexp_count(t, lit(r.pattern))),
        regexp_replace(t, r.pattern, r.replacement))
    }
    out.withColumn(s"${textCol}_redacted", redacted)
  }

  /** Total residual matches of every rule against the already-redacted
    * text — the invariant a redaction audit pins to zero. */
  def residual(redactedCol: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.map(r => regexp_count(redactedCol, lit(r.pattern)))
      .reduce(_ + _)

  /** The replacement chain alone as one Column (rules in order, no count
    * columns) — the scalar kernel the SQL surface registers as
    * `redact_pii`, and exactly the `<textCol>_redacted` column [[redact]]
    * produces. */
  def redactedText(textCol: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(textCol)((t, r) => regexp_replace(t, r.pattern, r.replacement))
}
