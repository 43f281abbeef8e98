package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table: language-ID, quality
  * scoring, token counting, fingerprinting. All pure Catalyst column
  * expressions (TextFunctions), SQL-twinned.
  *
  * Intermediates (`toks`, per-feature counts) are staged as named columns:
  * higher-order functions run interpreted, and a multi-referenced inline
  * `tokens(text)` would re-run the regex split per lambda element; as
  * non-cheap multi-referenced aliases they stay in their own Project and
  * evaluate once per row (same pattern as Dedup.shingleSets). */
object TextAnalysis {

  /** N-gram/lexicon language-ID heuristic with per-language scores. */
  def langId(documents: DataFrame): DataFrame = {
    val scored = documents
      .withColumn("toks", tokens(col("text")))
      .withColumn("score_en", lexiconHits(col("toks"), StopwordsEn).cast("long"))
      .withColumn("score_de", lexiconHits(col("toks"), LexDe).cast("long"))
      .withColumn("score_fr", lexiconHits(col("toks"), LexFr).cast("long"))
      .withColumn("score_es", lexiconHits(col("toks"), LexEs).cast("long"))
      .withColumn("score_zh",
        size(regexp_extract_all(col("text"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long"))
      .withColumn("best",
        greatest(col("score_en"), col("score_de"), col("score_fr"), col("score_es"), col("score_zh")))
    val langs = Seq("en", "de", "fr", "es", "zh") // tie order: first wins
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === col("best") && col("best") > 0, lit(l)).otherwise(acc)
    }
    scored.select(col("doc_id"), pred.as("lang_pred"),
        col("score_en"), col("score_de"), col("score_fr"), col("score_es"), col("score_zh"))
      .orderBy(col("doc_id"))
  }

  /** Length/punctuation/stopword quality features + composite score. */
  def quality(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("stopword_ratio",
        round(lexiconHits(col("toks"), StopwordsEn).cast("double")
          / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(col("text"), lit("[.!?,;:]"), lit(0))).cast("double")
          / greatest(col("n_chars"), lit(1L)), 4))
      .withColumn("avg_token_len",
        round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double")
          / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("len_score",
        when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, 1.0)
          .when(col("n_tokens") >= 5, 0.5).otherwise(0.0))
      .withColumn("quality",
        round(col("len_score") * 0.5
          + when(col("stopword_ratio") > 0.01, 0.25).otherwise(0.0)
          + when(col("punct_ratio") < 0.2, 0.25).otherwise(0.0), 4))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("stopword_ratio"),
        col("punct_ratio"), col("avg_token_len"), col("quality"))
      .orderBy(col("doc_id"))

  /** Whitespace and BPE-ish token counts. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_word_tokens"),
        bpeishCount(col("text")).as("n_bpeish_tokens"))
      .orderBy(col("doc_id"))

  /** Normalized-content fingerprint (exact-dedup / lineage key). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
}
