package graft.pipeline

import org.apache.spark.sql.DataFrame

/** PII detection and redaction over a text column — the scrubbing pass
  * a training pipeline runs before any corpus leaves quarantine:
  * count and mask emails, phone numbers, and IPv4 addresses.
  *
  * Patterns are restricted to the Java-regex ∩ RE2 portable subset
  * (character classes, `\b`, `\d`, bounded repetition — no lookaround,
  * no backreferences), so the identical pattern strings run in the
  * DuckDB oracle. Everything is a codegen'd regexp projection: no UDF,
  * no shuffle, scales as a pure map over the corpus.
  */
object Pii {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+\\d[\\d-]{5,}\\d"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order is part of the contract: emails first (their
    * local/domain parts may contain digit runs an IP pattern could
    * clip), then phones (digit-dash runs), then bare dotted quads. */
  val masks: Seq[(String, String)] = Seq(
    emailPattern -> "<EMAIL>",
    phonePattern -> "<PHONE>",
    ipv4Pattern -> "<IP>")

  /** Quote a regex as a Spark SQL string literal. */
  private def q(p: String): String =
    "'" + p.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Per-document PII counts (pre-redaction) plus the redacted text:
    * `(doc_id, n_email, n_phone, n_ip, redacted)`. Expects a `text`
    * column; carries `doc_id`. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val red = masks.foldLeft(textCol) { case (e, (p, m)) =>
      s"regexp_replace($e, ${q(p)}, '$m')"
    }
    docs.selectExpr(
      "doc_id",
      s"size(regexp_extract_all($textCol, ${q(emailPattern)}, 0)) AS n_email",
      s"size(regexp_extract_all($textCol, ${q(phonePattern)}, 0)) AS n_phone",
      s"size(regexp_extract_all($textCol, ${q(ipv4Pattern)}, 0)) AS n_ip",
      s"$red AS redacted")
  }
}
