package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: stopword-based language
  * ID, quality scoring, token counting (whitespace + BPE-ish regex),
  * content fingerprinting, and PII redaction. All expressed as
  * codegen-friendly column expressions — no UDFs — so they run inside
  * whole-stage codegen at any scale.
  */
object TextAnalysis {

  // PII patterns written WITHOUT backslash escapes ('[.]' not '\.') so
  // the identical string is a valid, equivalent regex in Java (Spark),
  // RE2 (DuckDB oracle), and a SQL string literal in both dialects.
  val UrlRe = "https://[a-z0-9./]+"
  val EmailRe = "[a-z0-9]+@[a-z0-9]+[.]com"
  val PhoneRe = "555-[0-9]{4}"

  /** Redact URLs, then emails, then phone numbers (fixed order — URLs
    * first so an address inside a URL is not half-rewritten). Pure
    * codegen `regexp_replace` chain: zero shuffle, scales with the scan. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(UrlRe), lit("[URL]")),
        lit(EmailRe), lit("[EMAIL]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Occurrences of one PII pattern (for redaction audit columns). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  private val stop = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "y", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "une", "est"))

  private def hits(lang: String, splitFn: String): String = {
    val lst = stop(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(len__(list_filter__($splitFn, x -> x IN ($lst))) AS BIGINT)"
  }

  /** Render for a dialect: Spark uses size/filter, DuckDB len/list_filter. */
  private def langSql(splitFn: String, lenF: String, filterF: String): String = {
    def h(l: String) = hits(l, splitFn)
      .replace("len__", lenF).replace("list_filter__", filterF)
    s"""SELECT doc_id,
       |  ${h("en")} AS en_hits,
       |  ${h("es")} AS es_hits,
       |  ${h("de")} AS de_hits,
       |  ${h("fr")} AS fr_hits,
       |  CASE WHEN ${h("en")} >= ${h("es")} AND ${h("en")} >= ${h("de")} AND ${h("en")} >= ${h("fr")} THEN 'en'
       |       WHEN ${h("es")} >= ${h("de")} AND ${h("es")} >= ${h("fr")} THEN 'es'
       |       WHEN ${h("de")} >= ${h("fr")} THEN 'de'
       |       ELSE 'fr' END AS pred_lang,
       |  lang AS labeled_lang
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  private val q54Spark = langSql("split(text, ' ')", "size", "filter")
  private val q54Duck = langSql("string_split(text, ' ')", "len", "list_filter")

  private def qualitySql(splitFn: String, lenF: String, filterF: String,
                         replFlag: String): String = {
    val ws = splitFn
    val stopList = stop("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_m,
       |  CAST($lenF($ws) AS BIGINT) AS n_words,
       |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / $lenF($ws), 4) AS avg_word_len,
       |  round(CAST($lenF($filterF($ws, x -> x IN ($stopList))) AS DOUBLE) / $lenF($ws), 4) AS stopword_ratio,
       |  round(CAST(length(text) - length(regexp_replace(text, '[a-z ]', ''$replFlag)) AS DOUBLE) / length(text), 4) AS nonalpha_ratio,
       |  round(least(1.0, $lenF($ws) / 100.0) *
       |        (1.0 - CAST($lenF($filterF($ws, x -> x IN ($stopList))) AS DOUBLE) / $lenF($ws)), 4) AS quality_score
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  private val q55Spark = qualitySql("split(text, ' ')", "size", "filter", "")
  private val q55Duck = qualitySql("string_split(text, ' ')", "len", "list_filter", ", 'g'")

  // Whitespace tokens vs a BPE-ish regex tokenizer (letter runs, digit
  // runs, single punctuation marks) — the standard pre-tokenizer split.
  private val tokPat = "'[a-z]+|[0-9]+|[^a-z0-9 ]'"
  private val q56Spark =
    s"""SELECT doc_id,
       |  CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens,
       |  CAST(size(regexp_extract_all(text, $tokPat, 0)) AS BIGINT) AS bpe_tokens,
       |  round(CAST(length(text) AS DOUBLE) / size(regexp_extract_all(text, $tokPat, 0)), 4) AS chars_per_token
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  private val q56Duck =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, $tokPat)) AS BIGINT) AS bpe_tokens,
       |  round(CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, $tokPat)), 4) AS chars_per_token
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // Content fingerprint: md5 over whitespace-normalized text, with a
  // 16-hex-char prefix as the compact dedup key.
  private def fpSql(replFlag: String) =
    s"""SELECT doc_id,
       |  substring(md5(trim(regexp_replace(lower(text), ' +', ' '$replFlag))), 1, 16) AS fp16,
       |  md5(trim(regexp_replace(lower(text), ' +', ' '$replFlag))) AS fp_full
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  private val q57Spark = fpSql("")
  private val q57Duck = fpSql(", 'g'")

  val queries: Map[String, QueryFn] = Map(
    "q54_langid" -> Q.fromSql(q54Spark),
    "q55_quality_score" -> Q.fromSql(q55Spark),
    "q56_token_count" -> Q.fromSql(q56Spark),
    "q57_fingerprint" -> Q.fromSql(q57Spark),

    // PII redaction + audit counts. The corpus has no natural PII, so
    // the query plants a deterministic email/phone/URL per document from
    // its own columns (identically in the oracle), then redacts.
    "q72_pii_redact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val synth = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" visit https://site.org/"), col("source"))
      docs.select(col("doc_id"), synth.as("synth"))
        .select(col("doc_id"),
          redactPii(col("synth")).as("clean"),
          piiCount(col("synth"), UrlRe).as("n_urls"),
          piiCount(col("synth"), EmailRe).as("n_emails"),
          piiCount(col("synth"), PhoneRe).as("n_phones"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q54_langid" -> q54Duck,
    "q55_quality_score" -> q55Duck,
    "q56_token_count" -> q56Duck,
    "q57_fingerprint" -> q57Duck,

    "q72_pii_redact" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS STRING) ||
         |    '@mail' || CAST(doc_id % 7 AS STRING) || '.com call 555-' ||
         |    lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ||
         |    ' visit https://site.org/' || source AS synth
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(synth,
         |    '$UrlRe', '[URL]', 'g'),
         |    '$EmailRe', '[EMAIL]', 'g'),
         |    '$PhoneRe', '[PHONE]', 'g') AS clean,
         |  CAST(len(regexp_extract_all(synth, '$UrlRe', 0)) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(synth, '$EmailRe', 0)) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(synth, '$PhoneRe', 0)) AS BIGINT) AS n_phones
         |FROM s
         |ORDER BY doc_id""".stripMargin
  )
}
