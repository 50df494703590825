package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data pipelines: regex-driven
  * scrubbing of emails, phone numbers, IPs before a corpus ships to
  * pretraining.
  *
  * Narrow (per-row, no shuffle), codegen-friendly (built-in regexp
  * expressions only), and engine-portable: every pattern sticks to the
  * regex subset where Java (Spark) and RE2 (DuckDB oracle) agree —
  * character classes, bounded repetition, \b — no backrefs or lookarounds
  * (RE2 has none).
  *
  * At 100 TB this is a pure map stage: it pipelines behind the scan and
  * costs no exchange; rules apply in declared order, so a later rule sees
  * earlier rules' replacement tokens (e.g. phone redaction never fires
  * inside an already-redacted email).
  */
object Pii {

  /** (name, pattern, replacement) redaction rules. */
  type Rule = (String, String, String)

  val emailRule: Rule =
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  /** NNN-NNN-NNNN phone shape (deliberately strict — broaden per corpus);
    * \b keeps it from firing inside longer digit runs. */
  val phoneRule: Rule = ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")
  val ipv4Rule: Rule = ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  val defaultRules: Seq[Rule] = Seq(emailRule, phoneRule, ipv4Rule)

  /** Redact `textCol` under `rules` (in order) and count matches per rule
    * (counted on the ORIGINAL text, so counts are rule-order-independent).
    * Emits `idCol`, `redacted`, and one `n_<name>` column per rule. */
  def redact(
      df: DataFrame, idCol: String, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame = {
    val redacted = rules.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val counts = rules.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    df.select(col(idCol) +: redacted.as("redacted") +: counts: _*)
  }
}
