package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** PII detection and redaction over the document corpus — the scrub
  * stage every training-data pipeline runs before text leaves curation
  * (emails, SSNs, phone numbers, IPv4 addresses → typed placeholders),
  * plus the per-class audit counts a compliance review wants
  * (builder-prompt scale extension; the reference has no text-curation
  * surface — its incremental-ingest semantics are covered elsewhere).
  *
  * Execution shape: ONE narrow per-row pass of built-in
  * `regexp_extract_all` / `regexp_replace` expressions (codegen'd — no
  * UDF, no shuffle, no explode); at 100 TB this runs at scan speed
  * alongside the other fused text profiling, and the audit aggregate is
  * a map-side-partial count on a constant-cardinality key.
  *
  * Pattern portability is the design constraint: ONE pattern list
  * ([[patterns]]) feeds both the Spark expressions (Java regex) and the
  * DuckDB oracle (RE2), so the subset used must behave identically in
  * both engines — character classes, bounded repetition, non-capturing
  * groups, and ASCII `\b` word boundaries only; no backreferences, no
  * lookaround (RE2 has neither). Redaction applies the classes in the
  * listed order and every placeholder is digit-free, so an earlier
  * replacement can never manufacture a later pattern's match across its
  * boundary (spec-pinned on a mixed-class fixture).
  */
object Pii {

  /** (class, portable regex, placeholder) — the single source of truth
    * for engine AND oracle. Order = redaction order: email first (an
    * address may embed digit runs the numeric classes would otherwise
    * bite into), then the most-specific numeric shapes. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
      "<EMAIL>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "<PHONE>"),
    ("ipv4", """\b(?:\d{1,3}\.){3}\d{1,3}\b""", "<IP>"))

  /** Per-class match count of one text column — independent
    * `regexp_extract_all` per class over the ORIGINAL text. */
  def countOf(text: Column, regex: String): Column =
    size(regexp_extract_all(text, lit(regex), lit(0))).cast("long")

  /** The redacted text: classes applied in [[patterns]] order, each
    * replacing ALL occurrences with its typed placeholder. */
  def redacted(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** Audit + scrub in one pass: per-doc class counts and the redacted
    * text. Downstream keeps `text_redacted`; the counts feed the
    * compliance aggregate. */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      (Seq(col("doc_id")) ++
        patterns.map { case (name, re, _) =>
          countOf(col("text"), re).as(s"n_$name") } ++
        Seq(redacted(col("text")).as("text_redacted"))): _*)

  // ---- SparkEntry wiring -------------------------------------------------

  /** Planted fixture under ids disjoint from the corpus: every class,
    * multi-occurrence lines, adjacent classes (the redaction-order
    * hazard: an email embedding an SSN-shaped digit run, an IP next to
    * a phone), and clean rows. The corpus rows themselves are expected
    * PII-free — the fixture is what makes the counts non-vacuous. */
  val PiiFixture: Seq[(Long, String)] = Seq(
    (2000000L, "contact alice.smith+spam@example.co.uk or bob@corp.io today"),
    (2000001L, "server 192.168.0.1 and 10.0.0.255 responded to 8.8.8.8"),
    (2000002L, "call 555-867-5309 or 555.867.5309 before noon"),
    (2000003L, "leaked ssn 123-45-6789 beside phone 312-555-0188"),
    // the redaction-ORDER hazard row: the local part starts with an
    // SSN-shaped digit run AT a word boundary, so the SSN class matches
    // it on the original text (n_ssn counts it — audit counts are
    // per-class independent) but email-first redaction absorbs the
    // whole address; ssn-first would emit "<SSN>@files.example.com"
    (2000004L, "123-45-6789@files.example.com mailed 172.16.254.3"),
    (2000005L, "perfectly clean document with no identifiers at all"),
    (2000006L, "mixed bag: eve@ex.org, 127.0.0.1, 987-65-4321, 800-555-1212"))

  /** q73: the scrub over real corpus rows UNION the planted fixture —
    * per-doc class counts plus the md5 of the redacted text, so the
    * oracle hash-pins both the detection counts and every replacement
    * byte (placement, order, all-occurrences semantics). */
  def qPiiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d).filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .unionByName(PiiFixture.toDF("doc_id", "text"))
    scrub(src)
      .withColumn("redacted_hash", md5(col("text_redacted")))
      .drop("text_redacted")
      .orderBy("doc_id")
  }

  private def fixtureValues: String = PiiFixture.map {
    case (id, text) => s"($id, '${text.replace("'", "''")}')"
  }.mkString(", ")

  /** DuckDB twin: identical patterns (RE2 ∩ Java subset — see the
    * object doc), `regexp_extract_all` for counts, chained
    * `regexp_replace(…, 'g')` in the same class order ('g' because
    * DuckDB replaces only the first match by default, where Spark
    * replaces all). */
  val qPiiScrubSql: String = {
    def esc(re: String) = re.replace("'", "''")
    val counts = patterns.map { case (name, re, _) =>
      s"len(regexp_extract_all(text, '${esc(re)}')) AS n_$name"
    }.mkString(",\n       ")
    val redact = patterns.foldLeft("text") { case (expr, (_, re, ph)) =>
      s"regexp_replace($expr, '${esc(re)}', '$ph', 'g')"
    }
    s"""WITH psrc AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 40
       |  UNION ALL SELECT * FROM (VALUES $fixtureValues) fx(doc_id, text))
       |SELECT doc_id,
       |       $counts,
       |       md5($redact) AS redacted_hash
       |FROM psrc ORDER BY doc_id""".stripMargin
  }
}
