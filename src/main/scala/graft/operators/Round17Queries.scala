package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-17 additions (SURVEY.md §2 R20 — text analysis):
  *
  *   - `t_lang_spans`  SPAN-LEVEL LANGUAGE SEGMENTATION — the code-switch
  *                     detector a multilingual corpus build runs between
  *                     language ID and filtering: `t_lang_id` labels the
  *                     whole document, but real pages mix languages (an
  *                     English nav/boilerplate frame around a non-English
  *                     body, quoted passages, code-switched forums), and
  *                     per-language corpus routing needs the CONTIGUOUS
  *                     SPANS, not one doc-level vote. Fixed non-overlapping
  *                     token windows are each classified by the same marker
  *                     evidence the doc-level classifier uses, and adjacent
  *                     same-language windows merge into spans
  *                     (gaps-and-islands over the window ordinal).
  */
object Round17Queries {

  /** Tokens per classification window for `t_lang_spans` — small enough
    * that a one-line foreign insertion gets its own span, large enough
    * that the ≥1-marker evidence is meaningful within a window.
    */
  private[graft] val SpanWindowTokens = 5

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R20 — SPAN-LEVEL LANGUAGE SEGMENTATION. Scale shape: window
    // formation is the shared per-row narrow slice ([[Round15Queries
    // .docLines]] — no shuffle, no self-join); the islands merge is ONE
    // window function partitioned by (doc_id, lang) — partitions are
    // doc-bounded, never corpus-sized — and one (doc_id, lang, grp)
    // aggregate. Nothing corpus-wide shuffles except the doc_id-keyed
    // exchange every per-doc operator pays.
    "t_lang_spans" -> ((s, d) =>
      langSpans(Tables.documents(s, d).select(col("doc_id"), col("text"))))
  )

  /** Core of `t_lang_spans`, reusable over any (doc_id, text) frame
    * (spec-tested on planted code-switch fixtures): classify each
    * [[SpanWindowTokens]]-token window by marker evidence (≥1 of the
    * `t_lang_id` markers ⇒ "en", else "other" — the window is too small
    * for the doc-level ≥3 dial), then merge adjacent same-language
    * windows by the gaps-and-islands ordinal trick: within (doc, lang),
    * `window_no − (rank−1)` is constant exactly on consecutive runs.
    */
  private[graft] def langSpans(docs: DataFrame,
                               w: Int = SpanWindowTokens): DataFrame = {
    val wins = Round15Queries.docLines(docs, w)
      .select(col("doc_id"), col("line_no").cast(LongType).as("win_no"),
        when(size(filter(split(col("line"), " "),
          t => t.isin("the", "a"))) >= 1, "en")
          .otherwise("other").as("lang"))
    val byDocLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("lang")).orderBy(col("win_no"))
    wins
      .withColumn("grp",
        col("win_no") - (row_number().over(byDocLang).cast(LongType) - 1L))
      .groupBy(col("doc_id"), col("lang"), col("grp"))
      .agg(min(col("win_no")).as("span_start"),
        max(col("win_no")).as("span_end"),
        count(lit(1)).cast(LongType).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("lang"), col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  val oracles: Map[String, String] = Map(

    // replays the window formation (1-based subscripts grouped by
    // (i-1)//w, the d_line_dedup discipline), the per-window marker vote,
    // and the same islands arithmetic
    "t_lang_spans" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         wins AS (
           SELECT doc_id,
                  CAST((i - 1) // $SpanWindowTokens AS BIGINT) AS win_no,
                  CASE WHEN sum(CASE WHEN tok IN ('the', 'a')
                                     THEN 1 ELSE 0 END) >= 1
                       THEN 'en' ELSE 'other' END AS lang
           FROM toks GROUP BY doc_id, (i - 1) // $SpanWindowTokens),
         isl AS (
           SELECT doc_id, win_no, lang,
                  win_no - (CAST(row_number() OVER (
                    PARTITION BY doc_id, lang ORDER BY win_no) AS BIGINT) - 1)
                    AS grp
           FROM wins)
         SELECT doc_id,
                CAST(min(win_no) AS BIGINT) AS span_start,
                CAST(max(win_no) AS BIGINT) AS span_end,
                lang,
                CAST(count(*) AS BIGINT) AS n_windows
         FROM isl GROUP BY doc_id, lang, grp
         ORDER BY doc_id, span_start"""
  )
}
