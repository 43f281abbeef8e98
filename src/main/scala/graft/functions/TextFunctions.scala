package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline operators
  * (dedup, language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is composed from `org.apache.spark.sql.functions` —
  * codegen'd Catalyst expressions, no UDFs — so the hot path over a 100 TB
  * `documents` table stays inside whole-stage codegen and every function has
  * an exact ANSI-SQL twin the DuckDB oracle can run (SparkEntry.oracleSql).
  *
  * Reference analog: the crawler's only text op is Jsoup extraction
  * (`simple-worker/.../HabrParser.scala:16-20`); these generalize that into
  * the corpus-preparation functions a crawl-derived training set needs.
  */
object TextFunctions {

  /** Shared stopword lexicons (tiny on purpose — deterministic heuristic,
    * not a model). Must stay in sync with the SQL literals in SparkEntry. */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")
  val LexDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
  val LexFr: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "pour")
  val LexEs: Seq[String] = Seq("el", "los", "las", "y", "es", "un", "una", "de", "que", "por")

  /** Lowercased alphanumeric tokens, empties dropped.
    * SQL twin: `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')` */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Number of tokens that appear in a (small, literal) lexicon. */
  def lexiconHits(toks: Column, lex: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(lex.toArray), t)))

  /** BPE-ish token count: alnum runs plus single non-alnum-non-space marks
    * (the whitespace-tokenizer upper bound a BPE vocab would refine). */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Document fingerprint: md5 of whitespace-collapsed, trimmed, lowercased
    * text — the exact-dedup key. SQL twin: `md5(trim(regexp_replace(...)))`. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  // ---------- MinHash / LSH / SimHash (single-pass Scala via TextCore;
  // see TextCore's scaladoc for why these are UDFs, not HOF chains) --------

  /** Distinct word-n-gram shingles straight from raw text. */
  def shingleSetUdf(n: Int): UserDefinedFunction =
    udf((text: String) => TextCore.distinctShinglesOf(text, n))

  /** (band, bandHash) pairs of the k-minhash signature, from raw text. */
  def minhashBandsUdf(n: Int, k: Int, bands: Int): UserDefinedFunction =
    udf((text: String) => {
      val shs = TextCore.distinctShinglesOf(text, n)
      if (shs.isEmpty) Array.empty[(Int, Long)]
      else TextCore.bandHashes(TextCore.minhashSig(shs, k), bands).zipWithIndex.map(_.swap)
    })

  /** 64-bit simhash fingerprint from raw text. */
  val simhashUdf: UserDefinedFunction =
    udf((text: String) => TextCore.simhash(TextCore.tokensOf(text)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
