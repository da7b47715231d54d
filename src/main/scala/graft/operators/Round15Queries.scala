package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 additions (SURVEY.md §2; VERDICT r14 #6):
  *
  *   - `d_line_dedup`  R17/R20  LINE-LEVEL BOILERPLATE DEDUP — the C4
  *                              "remove repeated lines across documents"
  *                              scrub (the one major pre-training cleanup
  *                              not yet in the family; distinct from
  *                              `d_span_dedup`'s sliding token shingles:
  *                              here the unit is a fixed NON-overlapping
  *                              segment — the stand-in for a real corpus's
  *                              newline-split lines, which this fixture's
  *                              single-line docs lack — and the cut is
  *                              corpus-wide line frequency, not pairwise
  *                              overlap). Nav menus, cookie banners, and
  *                              share-bars appear verbatim across many
  *                              pages; dropping every line that occurs in
  *                              more than [[MaxDocsPerLine]] distinct
  *                              documents removes them while keeping
  *                              body text, and each document is then
  *                              RECONSTRUCTED from its surviving lines in
  *                              order.
  */
object Round15Queries {

  /** Tokens per synthesized "line" for `d_line_dedup`. The fixture's docs
    * are single-line token streams, so lines are fixed non-overlapping
    * 3-token segments — measured at sf0.01 this yields 7,460 distinct
    * lines of which 231 cross the boilerplate cut (real work for the
    * filter: most text survives, repeated fragments drop). On real data
    * with newlines the segmentation is `split(text, '\n')` and everything
    * downstream is unchanged.
    */
  private[graft] val LineTokens = 3

  /** Boilerplate cut: a line occurring in MORE than this many distinct
    * documents is dropped from every document (C4 drops any line repeated
    * across the corpus; the >2 dial keeps legitimate 2-doc coincidences —
    * quotations, shared citations — and still fires at every SF).
    */
  private[graft] val MaxDocsPerLine = 2L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R17/R20 — LINE-LEVEL BOILERPLATE DEDUP. Scale shape: line
    // formation is a pure per-row transform (slice over the token array —
    // no shuffle, no self-join); the corpus-frequency table keys every
    // shuffle on xxhash64(line) (8-byte keys — line TEXT never shuffles
    // on the frequency side; the 2⁻⁶⁴ collision caveat is the exact-dedup
    // family's documented trade), first (lh, doc_id)-distinct for the
    // map-side-combinable per-doc dedup, then an lh-keyed count whose
    // exchange the verdict join reuses. The frequency side is
    // deliberately NOT broadcast-hinted: the distinct-line table grows
    // with the corpus (the t_lm_score vocab discipline — AQE may still
    // pick broadcast when it fits). Reconstruction is one doc_id-keyed
    // aggregate; per-doc line counts are bounded by doc length, so the
    // collect_list is row-sized, never corpus-sized.
    "d_line_dedup" -> ((s, d) =>
      lineDedup(Tables.documents(s, d).select(col("doc_id"), col("text"))))
  )

  /** Line-level boilerplate dedup core (see the `d_line_dedup` def).
    * `docs` carries (doc_id, text); output is one row per document:
    * total line count, surviving line count, and the document text
    * reconstructed from surviving lines in original order (empty string
    * when every line was boilerplate — the row still appears, so the
    * "this page was ALL chrome" census is readable downstream).
    */
  private[graft] def lineDedup(docs: DataFrame, w: Int = LineTokens,
                               maxDocs: Long = MaxDocsPerLine): DataFrame = {
    // fixed non-overlapping w-token segments, built narrow: indices
    // 0..ceil(n/w)-1 via filter (NOT sequence(0, ceil-1): Spark's
    // sequence runs DESCENDING when stop < start — the t_lm_score lesson)
    val lines = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(filter(sequence(0, size(toks) div $w),
                             i -> i * $w < size(toks)),
                      i -> array_join(slice(toks, i * $w + 1, $w), ' '))"""))
        .as(Seq("line_no", "line")))
      .withColumn("lh", xxhash64(col("line")))
    // corpus frequency: distinct docs per line hash (within-doc repeats
    // count once — a doc's own refrain is not cross-doc boilerplate)
    val freq = lines.select(col("lh"), col("doc_id")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("ndocs"))
    lines.join(freq, Seq("lh"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("ndocs") <= maxDocs, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("ndocs") <= maxDocs,
                struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          " ").as("kept_text"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(

    // replays the segmentation (1-based subscripts grouped by (i-1)//w ≡
    // the 0-based slice windows), the distinct-doc frequency, the cut,
    // and the in-order reconstruction exactly; DuckDB string_agg skips
    // the CASE's NULLs just as collect_list skips them
    "d_line_dedup" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         lines AS (
           SELECT doc_id, CAST((i - 1) // $LineTokens AS BIGINT) AS line_no,
                  string_agg(tok, ' ' ORDER BY i) AS line
           FROM toks GROUP BY doc_id, (i - 1) // $LineTokens),
         freq AS (
           SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
           FROM lines GROUP BY line)
         SELECT l.doc_id,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN f.ndocs <= $MaxDocsPerLine
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                coalesce(string_agg(
                  CASE WHEN f.ndocs <= $MaxDocsPerLine THEN l.line END,
                  ' ' ORDER BY l.line_no), '') AS kept_text
         FROM lines l JOIN freq f USING (line)
         GROUP BY l.doc_id ORDER BY l.doc_id"""
  )
}
