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

  /** Luhn checksum validity of a SEPARATOR-FREE digit string — the
    * check that separates credit-card detection from blind digit-run
    * redaction (a 16-digit order id fails it 90% of the time; every
    * real PAN passes by construction). Pure built-in expressions
    * (reverse + per-position fold), integer arithmetic only, so Spark
    * and the DuckDB oracle agree bit-for-bit; higher-order transform/
    * aggregate are interpreted, not codegen'd — acceptable here because
    * the fold runs once per CANDIDATE, and candidates are regex-rare. */
  def luhnValid(digits: Column): Column = {
    // Walk the REVERSED digits (Luhn doubles every second digit from the
    // right); element access via a char split — positions 1..length only,
    // so a trailing empty split artifact can never be read.
    val chars = split(reverse(digits), "")
    val total = aggregate(
      transform(sequence(lit(1), length(digits)), i => {
        val d = ascii(element_at(chars, i)) - lit(48)
        val dd = d * lit(2)
        when(i % 2 === 0, when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    length(digits) > 0 && total % 10 === 0
  }

  /** Credit-card detection + redaction with Luhn VALIDATION: digit runs
    * of 13-19 (spaces/dashes allowed) are candidates; only candidates
    * whose digits pass [[luhnValid]] redact — the practice that keeps a
    * scrubber from eating order ids and timestamps wholesale. Candidate
    * extraction is the same RE2-safe regex subset as the rules above;
    * per-row redaction is a fold of plain replacements over the row's
    * OWN valid candidates (higher-order aggregate — no shuffle, no UDF).
    * Emits idCol, `redacted`, `n_cc_candidates`, `n_cc_valid`. */
  val ccCandidatePattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  def redactCreditCards(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(ccCandidatePattern), lit(0))
    val valid = filter(cands,
      c => luhnValid(regexp_replace(c, "[ -]", "")))
    df.select(col(idCol),
        col(textCol).as("__t"), cands.as("__c"), valid.as("__v"))
      .select(col(idCol),
        aggregate(col("__v"), col("__t"),
          (acc, c) => regexp_replace(acc, c, lit("<CC>"))).as("redacted"),
        size(col("__c")).cast("long").as("n_cc_candidates"),
        size(col("__v")).cast("long").as("n_cc_valid"))
  }

  /** ISO 13616 IBAN checksum validity (mod-97-10): rearrange (first 4
    * chars to the end), map letters to two-digit numbers (A=10..Z=35),
    * and the resulting big decimal must be ≡ 1 (mod 97). The big number
    * never materializes — the fold carries only `acc mod 97` (digits:
    * acc·10+d; letters: acc·100+v, each reduced immediately), so the
    * arithmetic stays in integer range and is engine-exact. Input must
    * be the bare candidate (uppercase, no spaces). */
  def ibanValid(iban: Column): Column = {
    val rearranged = concat(substring(iban, 5, 1000000), substring(iban, 1, 4))
    val chars = split(rearranged, "")
    val m = aggregate(
      sequence(lit(1), length(rearranged)),
      lit(0L),
      (acc, i) => {
        val c = ascii(element_at(chars, i))
        when(c >= 65, (acc * 100L + (c - 48 - 7L).cast("long")) % 97L)
          .otherwise((acc * 10L + (c - 48L).cast("long")) % 97L)
      })
    length(iban) >= 15 && m === 1L
  }

  /** IBAN detection + redaction with mod-97 VALIDATION — the
    * international sibling of [[redactCreditCards]], same candidate →
    * validate → fold-replace shape. Candidates: two country letters,
    * two check digits, 11-30 alphanumerics. Emits idCol, `redacted`,
    * `n_iban_candidates`, `n_iban_valid`. */
  val ibanCandidatePattern = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  def redactIbans(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(ibanCandidatePattern), lit(0))
    val valid = filter(cands, c => ibanValid(c))
    df.select(col(idCol),
        col(textCol).as("__t"), cands.as("__c"), valid.as("__v"))
      .select(col(idCol),
        aggregate(col("__v"), col("__t"),
          (acc, c) => regexp_replace(acc, c, lit("<IBAN>"))).as("redacted"),
        size(col("__c")).cast("long").as("n_iban_candidates"),
        size(col("__v")).cast("long").as("n_iban_valid"))
  }

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
