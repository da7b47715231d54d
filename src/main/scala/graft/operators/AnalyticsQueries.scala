package graft.operators

import graft.Tables
import graft.functions.ParityMath.{floorRound, floorRoundSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 third-session additions: behavioral event analytics (funnel,
  * cohort retention) and corpus-statistics passes (per-dimension embedding
  * moments, Zipf-law fit, lexicon redaction) — the remaining "what would a
  * training-data / product-analytics team run daily" surface on top of the
  * existing inventory (reference scope: the event stream the service
  * delivers, reference/app/app.py:393-526; everything here is downstream
  * analytics over that stream's batch twin).
  */
object AnalyticsQueries {

  private val Deny = Seq("customer", "key", "value", "row")
  private def denySqlList: String = Deny.map(w => s"'$w'").mkString(", ")

  /** Funnel core (r_funnel) over any (user_id, event_type, ts) frame:
    * per-user first-occurrence times of view → click → purchase, then the
    * strictly-ordered progression counts. Comparisons happen on
    * epoch-millis (both engines floor ns → ms identically, dodging the
    * ns-vs-µs storage difference).
    */
  def funnel(eventsDf: DataFrame): DataFrame = {
    val ms = unix_millis(col("ts"))
    val u = eventsDf
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", ms)).as("tv"),
        min(when(col("event_type") === "click", ms)).as("tc"),
        min(when(col("event_type") === "purchase", ms)).as("tp"))
    u.agg(
        count(col("tv")).as("c1"),
        count(when(col("tc") > col("tv"), lit(1))).as("c2"),
        count(when(col("tc") > col("tv") && col("tp") > col("tc"), lit(1)))
          .as("c3"))
      .select(expr(
        """stack(3, 'f1_view', c1,
                    'f2_view_click', c2,
                    'f3_view_click_purchase', c3) AS (stage, n_users)"""))
      .orderBy("stage")
  }

  /** Cohort-retention core (r_cohort_retention): cohort = the user's first
    * event DATE (UTC); a user is retained at offset d when they have any
    * event on cohort_day + d, d ∈ [0, 7].
    */
  def cohortRetention(eventsDf: DataFrame): DataFrame = {
    val e = eventsDf.select(col("user_id"), to_date(col("ts")).as("day"))
    val f = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(f, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("offset_day"))
      .filter(col("offset_day").between(0, 7))
      .distinct()
      .groupBy(col("cohort_day"), col("offset_day"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .orderBy("cohort_day", "offset_day")
  }

  /** Per-dimension embedding moments (v_dim_stats) — the normalization /
    * whitening prep pass every vector pipeline runs before indexing.
    * Uniform-dim guard mirrors pqCodes (`size = 64`).
    */
  def dimStats(embDf: DataFrame, dim: Int = 64): DataFrame =
    embDf.filter(size(col("embedding")) === dim)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        min(col("x")).cast("double").as("x_min"),
        max(col("x")).cast("double").as("x_max"),
        floorRound(avg(col("x")), 4).as("x_mean"),
        floorRound(stddev_samp(col("x")), 4).as("x_std"))
      .orderBy("dim")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R11/R14-adjacent — event funnel: strictly-ordered first-touch
    // progression view → click → purchase. ONE shuffle (user_id) with
    // map-side partial min; the final 3-row stack is a scalar aggregate.
    // At 100 TB the shuffle carries one row per (partition × user) — the
    // same shape as q_distinct_users.
    "r_funnel" -> ((s, d) => funnel(Tables.events(s, d))),

    // R12/R13-adjacent — cohort retention heatmap input. Two keyed
    // shuffles (user_id for first-day + the join, which AQE plans off the
    // same exchange; then (cohort, offset) for the distinct+count). The
    // distinct() collapses (user, cohort, offset) BEFORE the count so the
    // final agg shuffle carries at most |users| × 8 rows, and the
    // first-day frame is per-user (≪ events) so its join side stays small.
    "r_cohort_retention" -> ((s, d) => cohortRetention(Tables.events(s, d))),

    // R19-adjacent — per-dimension embedding moments (count/min/max/mean/
    // stddev). posexplode multiplies rows ×64 but the hash aggregate is
    // map-side partial: the shuffle carries 64 rows per input partition,
    // constant in corpus size. min/max are float-exact in both engines
    // (no accumulation); mean/stddev accumulate in double and round to 4
    // decimals (the established float-parity dial).
    "v_dim_stats" -> ((s, d) => dimStats(Tables.embeddings(s, d))),

    // R20 — Zipf-law fit over the corpus word-frequency table:
    // rank words by frequency (ties broken by word — total order, so the
    // rank is deterministic across engines/partitionings), then OLS slope
    // of ln(freq) on ln(rank). The global row_number window runs on the
    // VOCAB, not the corpus — Heaps' law keeps |vocab| ≪ |tokens| (a 100 TB
    // corpus has ~10M types ⇒ a single-partition window over ~100 MB,
    // after the one token-keyed shuffle that builds the table map-side-
    // partially). regr_slope/intercept/r2 accumulate in double → 4-decimal
    // dial.
    "t_zipf_slope" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      val ranked = vocab.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("f").desc, col("w"))))
      ranked
        .select(log(col("f").cast("double")).as("lf"),
          log(col("rk").cast("double")).as("lr"))
        .agg(
          count(lit(1)).cast("long").as("n_types"),
          floorRound(expr("regr_slope(lf, lr)"), 4).as("zipf_slope"),
          floorRound(expr("regr_intercept(lf, lr)"), 4).as("zipf_intercept"),
          floorRound(expr("regr_r2(lf, lr)"), 4).as("zipf_r2"))
    }),

    // R20 — lexicon (denylist) redaction: the scrubbing stage of a corpus
    // pipeline (PII/sensitive-term removal; the synthetic corpus has no
    // real PII, so the denylist is four in-vocabulary terms — the
    // machinery, not the lexicon, is the deliverable). Token-exact
    // replacement via higher-order functions (per-row, whole-stage
    // codegen, zero shuffles); the redacted text is emitted as its md5 so
    // the oracle proves byte-identical scrubbing without moving full text
    // through the compare.
    "t_redact_lexicon" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(
          col("doc_id"),
          size(col("t")).as("n_tokens"),
          expr(s"size(filter(t, w -> w IN ($denySqlList)))").as("n_hits"),
          expr(
            s"""md5(array_join(transform(t,
                 w -> CASE WHEN w IN ($denySqlList) THEN '<RED>' ELSE w END),
               ' '))""").as("redacted_md5"))
        .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    "r_funnel" ->
      """WITH u AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS tv,
                  min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS tc,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS tp
           FROM events GROUP BY user_id)
         SELECT stage, n_users FROM (
           SELECT 'f1_view' AS stage,
                  CAST(count(tv) AS BIGINT) AS n_users FROM u
           UNION ALL
           SELECT 'f2_view_click',
                  CAST(count(CASE WHEN tc > tv THEN 1 END) AS BIGINT) FROM u
           UNION ALL
           SELECT 'f3_view_click_purchase',
                  CAST(count(CASE WHEN tc > tv AND tp > tc THEN 1 END) AS BIGINT) FROM u)
         ORDER BY stage""",
    "r_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
           f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
           a AS (SELECT DISTINCT e.user_id, f.cohort_day,
                        CAST(date_diff('day', f.cohort_day, e.day) AS INT) AS offset_day
                 FROM e JOIN f USING (user_id)
                 WHERE date_diff('day', f.cohort_day, e.day) BETWEEN 0 AND 7)
         SELECT cohort_day, offset_day, CAST(count(*) AS BIGINT) AS n_active
         FROM a GROUP BY cohort_day, offset_day
         ORDER BY cohort_day, offset_day""",
    "v_dim_stats" ->
      s"""SELECT t.i AS dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(min(e.embedding[t.i + 1]) AS DOUBLE) AS x_min,
                 CAST(max(e.embedding[t.i + 1]) AS DOUBLE) AS x_max,
                 ${floorRoundSql("avg(e.embedding[t.i + 1])", 4)} AS x_mean,
                 ${floorRoundSql("stddev_samp(e.embedding[t.i + 1])", 4)} AS x_std
          FROM embeddings e, range(0, 64) t(i)
          WHERE len(e.embedding) = 64
          GROUP BY t.i ORDER BY dim""",
    "t_zipf_slope" ->
      s"""WITH v AS (
            SELECT w, count(*) AS f FROM (
              SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
            WHERE len(w) > 0 GROUP BY w),
          r AS (
            SELECT ln(CAST(f AS DOUBLE)) AS lf,
                   ln(CAST(row_number() OVER (ORDER BY f DESC, w) AS DOUBLE)) AS lr
            FROM v)
          SELECT CAST(count(*) AS BIGINT) AS n_types,
                 ${floorRoundSql("regr_slope(lf, lr)", 4)} AS zipf_slope,
                 ${floorRoundSql("regr_intercept(lf, lr)", 4)} AS zipf_intercept,
                 ${floorRoundSql("regr_r2(lf, lr)", 4)} AS zipf_r2
          FROM r""",
    "t_redact_lexicon" ->
      s"""SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                 CAST(len(list_filter(string_split(text, ' '),
                        w -> list_contains([$denySqlList], w))) AS INT) AS n_hits,
                 md5(array_to_string(list_transform(string_split(text, ' '),
                       w -> CASE WHEN list_contains([$denySqlList], w)
                                 THEN '<RED>' ELSE w END), ' ')) AS redacted_md5
          FROM documents ORDER BY doc_id""")
}
