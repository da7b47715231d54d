package graft.operators

import graft.Tables
import graft.functions.ParityMath.floorRound
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 third-session additions (SURVEY.md §2) — the operator-expansion
  * wave. Pipeline hygiene / quality: `t_classifier_score` (hashed-feature
  * fastText-style quality filter), `t_bpe_apply` (tokenizer train→apply
  * with a reversibility round-trip), `d_dedup_keep_best` (quality-aware
  * near-dup representative), `d_corpus_build_v3` (capstone composing the
  * classifier gate + keep-best selection), `d_epoch_shuffle` (deterministic
  * multi-epoch shard shuffle plan). Approximate / sketch algebra:
  * `q_approx_groupby_ci` (Horvitz–Thompson sampled GROUP BY with 95%
  * half-widths), `q_hll_intersect` (inclusion–exclusion sketch
  * intersection). Warehouse / time series: `q_entity_resolution` (blocked
  * fuzzy matching), `r_resample_gapfill` (calendar grid + LOCF),
  * `r_rollup_delta` (incremental rollup refresh by partial-agg merge),
  * `r_drift_detect` / `r_drift_seasonal` (+ the shared streaming-twin
  * `driftCore`), `r_concurrency_curve` (session sweep line),
  * `q_trending_rank_delta` (native-TopKPerKey leaderboard movement),
  * `q_benford` (first-digit forensic audit), `t_eval_prf` (per-class
  * precision/recall/F1 over the shared-classifier confusion),
  * `q_impute_group_median` (entity-median repair). Vector: `v_pca_power`
  * (integer-exact power iteration), `v_whiten_project` (its apply half),
  * `v_quantile_norm` (per-dimension rank transform).
  *
  * Shared discipline: every shuffle is keyed on a bounded-cardinality
  * column (agg groups, blocks, calendar cells, shards, matrix indices) —
  * never the corpus; iterative state below the sub-threshold runs as a
  * single-task replay of the identical integer recurrence; float ops are
  * floorRound-pinned or avoided via integer units end to end.
  */
object Round11Queries {

  /** Per-token hashed-feature weight in integer "milli-units": bucket =
    * first 16 bits of md5(token), weight = LCG(bucket) mapped to
    * [-1024, 1024). Integer end-to-end so the corpus sum is exact
    * cross-engine; the only float op is the final normalized score.
    * Mirrors the mechanics of a hashed linear classifier (fastText's
    * hashing-trick bag-of-features with a fixed weight table) with a
    * deterministic weight function standing in for trained weights —
    * swapping in a broadcast weight array keeps the identical plan shape.
    */
  private val tokenWeightUnits =
    """(CAST(conv(substring(md5(t), 1, 4), 16, 10) AS BIGINT)
        * 1103515245 + 12345) % 2048 - 1024"""

  /** The per-doc classifier score fold — ONE definition shared by
    * `t_classifier_score`, `d_dedup_keep_best`, and `d_corpus_build_v3`
    * so a scoring tweak cannot silently desynchronize the gate from the
    * reported score.
    */
  private def scoreUnitsExpr: Column = expr(
    s"""aggregate(split(text, ' '), 0L, (acc, t) -> acc + ($tokenWeightUnits))""")

  /** R9 — inclusion–exclusion HLL intersection with its sketch-accuracy
    * audit: rsd=0.01 sketches per side + union, |A∩B| ≈ |A|+|B|−|A∪B|,
    * exact counterparts computed in the same job as ground truth. The
    * bound flags are PROBABILISTIC (the 5% side bound is ≈5σ of the
    * sketch's standard error; the I–E bound covers three terms' absolute
    * errors) — they are asserted in Round11Spec, NOT hash-compared by the
    * DuckDB oracle (ADVICE r11): the oracled query projects only the
    * exact columns. At 100 TB the exact branch is the audit; the sketch
    * branch reads each side once and merges constant-size state.
    */
  /** The (purchase, click) user_id sides + the exact inclusion–exclusion
    * branch, ONE definition consumed by both [[hllIntersectAudit]] and
    * the oracled `q_hll_intersect` def (review r20: the two were built
    * verbatim twice, so a gate tweak to one copy would silently desync
    * the spec-audited population from the oracle-hashed one — the drift
    * scoreUnitsExpr exists to prevent). countDistinct skips NULL
    * user_ids; the oracle mirrors with count(user_id), not count(*) over
    * DISTINCT (which would keep a NULL row the Spark side excludes).
    */
  private def intersectSides(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d)
    (ev.filter(col("event_type") === "purchase").select(col("user_id")),
     ev.filter(col("event_type") === "click").select(col("user_id")))
  }

  private def exactIntersect(a: DataFrame, b: DataFrame): DataFrame =
    a.distinct().join(b.distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_inter"))
      .crossJoin(a.agg(countDistinct(col("user_id")).as("exact_a")))
      .crossJoin(b.agg(countDistinct(col("user_id")).as("exact_b")))

  def hllIntersectAudit(s: SparkSession, d: String): DataFrame = {
    val (a, b) = intersectSides(s, d)
    val sk = a.agg(approx_count_distinct(col("user_id"), 0.01).as("hll_a"))
      .crossJoin(b.agg(approx_count_distinct(col("user_id"), 0.01).as("hll_b")))
      .crossJoin(a.union(b)
        .agg(approx_count_distinct(col("user_id"), 0.01).as("hll_u")))
    val ex = exactIntersect(a, b)
    sk.crossJoin(ex).select(
      col("exact_a"), col("exact_b"), col("exact_inter"),
      (abs(col("hll_a") - col("exact_a")) <= col("exact_a") * 0.05 &&
       abs(col("hll_b") - col("exact_b")) <= col("exact_b") * 0.05)
        .as("sides_within_5pct"),
      (abs(col("hll_a") + col("hll_b") - col("hll_u") - col("exact_inter"))
        <= (col("exact_a") + col("exact_b")) * 0.05)
        .as("inter_within_bound"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R20 — model-based quality filter: score = mean hashed-feature weight
    // over the token bag, kept = positive score. One scan, zero shuffles
    // before the per-row project; the whole scoring expression lives inside
    // whole-stage codegen (aggregate over split — no explode, so a 100 TB
    // corpus pays one pass and no token-level exchange).
    "t_classifier_score" -> ((s, d) => {
      val units = scoreUnitsExpr
      val nTok = size(split(col("text"), " ")).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), nTok.as("n_tokens"), units.as("score_units"))
        .withColumn("score",
          floorRound(col("score_units").cast("double") /
            (col("n_tokens").cast("double") * lit(1024.0)), 4))
        .withColumn("kept", col("score_units") > 0)
        .orderBy("doc_id")
    }),

    // R7 — approximate GROUP BY with error bars: a deterministic 10%
    // Bernoulli sample (LCG on the line's unique key — reproducible across
    // engines AND across runs, the property a production sampled-agg needs
    // for incremental refresh), Horvitz–Thompson estimate est = sum/p, and
    // the Bernoulli-design 95% half-width 1.96·sqrt(Σx²·(1-p))/p. The exact
    // column is the AUDIT (same as v_ivf_train_gain's one-row audit): at
    // 100 TB only the sample branch runs — against a 10%-sample table or a
    // storage-pushed sample — reading a tenth of the data; here both
    // branches fold into ONE conditional aggregation pass (6 groups, exact
    // integer sums, map-side partial agg).
    "q_approx_groupby_ci" -> ((s, d) => {
      // rk is reduced mod 2^31 BEFORE the LCG multiply: the raw key times
      // 1103515245 overflows Long once l_orderkey passes ~5.2e8 (TPC-H
      // sf≈90) — Spark would wrap silently (negative remainders all
      // sample) while DuckDB raises; the pre-reduction keeps the product
      // ≤ 2.4e18 on both engines at any scale.
      val rk = (col("l_orderkey") * lit(16L) + col("l_linenumber").cast("long")) %
        lit(2147483648L)
      val sampled = (rk * lit(1103515245L) + lit(12345L)) % lit(2147483648L) <
        lit(214748365L)
      // per-row quantization to integer units BEFORE summing (ADVICE r11):
      // Spark cast(double→long) truncates while DuckDB rounds, so a double
      // aggregate cast at the end only agrees when the sum is exactly
      // integral; floor(q+0.5) per row makes every sum integer end-to-end
      // (the r_rollup_delta discipline) and robust to non-integral data.
      val qu = floor(col("l_quantity") + lit(0.5)).cast("long")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(when(sampled, lit(1L)).otherwise(lit(0L))).as("n_sampled"),
          (sum(when(sampled, qu).otherwise(lit(0L))) * lit(10L))
            .as("est_sum_qty"),
          sum(when(sampled, qu * qu).otherwise(lit(0L))).as("sum_x2"),
          sum(qu).as("exact_sum_qty"))
        .select(
          col("l_returnflag"), col("l_linestatus"), col("n_sampled"),
          col("est_sum_qty"),
          floorRound(lit(19.6) * sqrt(col("sum_x2").cast("double") * lit(0.9)), 2)
            .as("ci_half"),
          col("exact_sum_qty"),
          (abs(col("est_sum_qty") - col("exact_sum_qty")).cast("double") <=
            floorRound(lit(19.6) * sqrt(col("sum_x2").cast("double") * lit(0.9)), 2))
            .as("covered"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // R18/R4 — blocked entity resolution over part names: exact-dedup the
    // corpus to its distinct-name entity table FIRST (vocabulary-sized by
    // Heaps' law — the corpus-sized work is one hash agg carrying support
    // counts), then block on the head noun and pair-join only within
    // blocks. The pair join touches C(names-per-block, 2) per block — never
    // the corpus — and the edit-distance verify is a codegen'd built-in.
    // Match rule: normalized Levenshtein similarity ≥ 0.55; merged_key is
    // the union-find-style canonical (min partkey) the merge step would
    // propagate.
    "q_entity_resolution" -> ((s, d) => {
      // localCheckpoint: both sides of the self-join consume this frame —
      // without it the corpus-sized dedup agg executes twice (the plan
      // showed two parquet scans). Vocabulary-sized, so the materialization
      // is trivially cheap; the iterative-frame discipline applied to a
      // reused one.
      val ents = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(count(lit(1)).as("support"), min(col("p_partkey")).as("canon_key"))
        .withColumn("block", regexp_extract(col("p_name"), "[^ ]+$", 0))
        .transform(Lineage.cut(_))
      val a = ents.as("a"); val b = ents.as("b")
      a.join(b,
          col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
        .select(
          col("a.block").as("block"),
          col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          (col("a.support") + col("b.support")).as("pair_support"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("edit_dist"),
          least(col("a.canon_key"), col("b.canon_key")).as("merged_key"))
        .withColumn("sim", floorRound(lit(1.0) -
          col("edit_dist").cast("double") /
            greatest(length(col("name_a")), length(col("name_b"))).cast("double"), 4))
        .withColumn("is_match", col("sim") >= 0.55)
        .orderBy("name_a", "name_b")
    }),

    // R20 — tokenizer train→apply (t_bpe_pairs' missing second half): mine
    // the top-3 corpus word bigrams (count desc, pair asc — a total
    // order), then apply them as sequential greedy merges. The merge pass
    // is pure string rewriting on a space-doubled text (every token owns
    // one space on each side, so a merge consumes only its own
    // delimiters): `replace` is leftmost non-overlapping in both engines —
    // exactly BPE's greedy application semantics — and a merged token's
    // '§' joint makes it opaque to later merge patterns, exactly
    // BPE-sequential. The mined merges travel as a ONE-ROW broadcast
    // (scalar-subquery pattern); the corpus pays one bigram-count agg +
    // one rewrite scan. `reversible` (un-merging restores the original
    // text, oracled per doc) pins the rewrite round trip.
    "t_bpe_apply" -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      val top3 = docsDf
        .select(split(col("text"), " ").as("t"))
        // size >= 2 guard: Spark's sequence(1, 0) DESCENDS, so a 1-token
        // doc would evaluate element_at(t, 0) and throw — the hazard
        // Round4Queries' collocation miner documents; DuckDB's range(1, 1)
        // is empty, so the filtered result is identical on both engines
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(t) - 1),
               i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""))
          .as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(3)
      val merges = top3
        .withColumn("rk",
          row_number().over(Window.orderBy(col("c").desc, col("pair"))))
        .agg(
          max(when(col("rk") === 1, col("pair"))).as("p1"),
          max(when(col("rk") === 2, col("pair"))).as("p2"),
          max(when(col("rk") === 3, col("pair"))).as("p3"))
      // a NULL merge slot (corpus with < 3 distinct bigrams) must be a
      // no-op, not a NULL text: replace(s, NULL, ...) would null every
      // downstream column and the round-trip contract would pass vacuously
      def mergeStep(src: String, p: String, dst: String) =
        expr(s"""CASE WHEN $p IS NULL THEN $src ELSE
                   replace($src, concat(' ', replace($p, ' ', '  '), ' '),
                                 concat(' ', replace($p, ' ', '§'), ' ')) END""")
          .as(dst)
      val nBefore = size(split(col("text"), " ")).cast("long")
      val nAfter = size(split(col("merged"), " ")).cast("long")
      docsDf.crossJoin(broadcast(merges))
        .withColumn("s0", concat(lit(" "), expr("replace(text, ' ', '  ')"), lit(" ")))
        .withColumn("s1", mergeStep("s0", "p1", "s1"))
        .withColumn("s2", mergeStep("s1", "p2", "s2"))
        .withColumn("s3", mergeStep("s2", "p3", "s3"))
        .withColumn("merged", trim(expr("replace(s3, '  ', ' ')")))
        .select(col("doc_id"), col("p1"), col("p2"), col("p3"),
          nBefore.as("n_before"), nAfter.as("n_after"),
          floorRound(nAfter.cast("double") / nBefore.cast("double"), 4)
            .as("compression"),
          (expr("replace(merged, '§', ' ')") === col("text")).as("reversible"))
        .orderBy("doc_id")
    }),

    // R9 — sketch-algebra intersection: HLL sketches union natively but
    // cannot intersect, so the standard workaround is inclusion–exclusion
    // over three sketches (A, B, A∪B) — with compounded error, which is
    // why the result ships as exact values + bound flags (the
    // q_approx_distinct sketch-vs-exact discipline): each rsd=0.01 sketch
    // gets a 5% bound (5σ), the I–E estimate a 5%-of-(|A|+|B|) bound
    // (covers all three terms' absolute errors). At 100 TB the exact
    // branch is the audit; the sketch branch reads each side once and
    // merges constant-size state.
    // Oracled surface = the EXACT columns only (ADVICE r11): the sketch
    // accuracy flags are PROBABILISTIC (rsd=0.01 HLL++ vs a heuristic 5%
    // bound ≈ 5σ) — hardcoding them TRUE in the oracle would turn a
    // statistical property into a hard parity gate that can fail at an
    // untested scale with both engines behaving correctly. The full audit
    // incl. sketch bounds is [[hllIntersectAudit]], asserted in Round11Spec
    // where a failure reads as "sketch outside bound", not "wrong answer".
    // Built directly (not as a projection of the audit): column pruning
    // empties the discarded sketch aggregates but does NOT remove their
    // crossJoined one-row subtrees, so projecting the audit still paid
    // three wasted corpus scans per gate run (r12 review).
    "q_hll_intersect" -> ((s, d) => {
      val (a, b) = intersectSides(s, d)
      exactIntersect(a, b)
        .select(col("exact_a"), col("exact_b"), col("exact_inter"))
    }),

    // R7/R6 — incremental aggregate maintenance: the materialized-rollup
    // refresh pattern. A day/type rollup already exists for everything up
    // to the cutoff (here: max day − 5, derived from the data via a
    // one-row broadcast); a late partition arrives; the refresh merges the
    // delta's PARTIAL aggregates into the materialized ones (counts and
    // integer-unit sums are mergeable: sum-of-partials = total) instead of
    // recomputing. `matches_full` joins the merged result against a full
    // recompute — exact integer equality, oracled — proving the merge is
    // lossless. At 100 TB the full branch never runs; the refresh costs
    // one pass over the DELTA plus a rollup-sized merge.
    "r_rollup_delta" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        to_date(col("ts")).as("day"), col("event_type"),
        floor(col("value") * 10000).cast("long").as("units"))
      val bounds = ev.agg(date_sub(max(col("day")), 5).as("cut"))
      val tagged = ev.crossJoin(broadcast(bounds))
      // ONE corpus pass builds both partial sets: the late flag joins the
      // grouping key, so "materialized" and "delta" partials fall out of a
      // single rollup (a plan audit showed the filter-twice form scanning
      // the corpus 2 extra times); the refresh merge then re-aggregates
      // the flagged partials — rollup-sized work.
      val partials = tagged
        .groupBy(col("day"), col("event_type"), (col("day") > col("cut")).as("late"))
        .agg(count(lit(1)).as("cnt"), sum(col("units")).as("sum_units"))
      val merged = partials
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("sum_units")).as("sum_units"))
      val full = ev
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt_f"), sum(col("units")).as("sum_f"))
      merged.join(full, Seq("day", "event_type"))
        .select(col("day"), col("event_type"), col("cnt"), col("sum_units"),
          (col("cnt") === col("cnt_f") && col("sum_units") === col("sum_f"))
            .as("matches_full"))
        .orderBy("day", "event_type")
    }),

    // R19 (r11) — dominant principal direction of the embedding corpus by
    // integer-exact power iteration: the PCA/whitening precursor of the
    // vector-index family (rotating onto principal axes before IVF-PQ is
    // the standard recall lever; this query computes the first axis). The
    // pipeline quantizes each component to integer milli-units (exact
    // cross-engine), builds the 64×64 second-moment matrix in ONE corpus
    // pass (per-partition Gram partial agg — see pcaAxis; the corpus
    // never self-joins), then runs 6 matrix-vector iterations as a
    // single-task replay: w = S·v, renormalized each step to ~10⁶ units
    // by TRUNCATING integer division — the semantics JVM Long `/`,
    // Spark `div`, and DuckDB `//` all share (verified on negatives), so
    // no floor adjustment exists or is needed. No driver collect, no
    // floats anywhere; `max_abs_delta` (v₆ vs v₅, integer units) is the
    // oracled convergence measure, so a non-converged direction cannot
    // pass silently.
    "v_pca_power" -> ((s, d) => pcaAxis(s, d).orderBy("dim")),

    // R13/R8 (r11) — day-over-day distribution drift: the data-monitoring
    // gate every production feed runs (alert when today's event-type mix
    // moves against yesterday's). Per-day type shares in integer BASIS
    // POINTS (cnt·10⁴ div total — truncating integral division, exact
    // cross-engine), consecutive days aligned by a (day+1, type)
    // full-outer join (either side may miss a type), drift = L1 distance
    // of the share vectors, flag at >1000 bp (10% mass moved). Shuffle
    // shape: one day/type agg over the corpus, then day-keyed joins on the
    // calendar-sized frame — the corpus pays one pass.
    "r_drift_detect" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      driftCore(daily, "day", b => date_add(b, 1))
    }),

    // R14/R13 (r11) — global session-concurrency curve: "how many sessions
    // are active each hour" — the capacity-planning sweep-line over the
    // q_sessionize islands. Sessions bucket to hours (active from
    // trunc(start) through trunc(end) inclusive); each contributes +1 at
    // its start hour and −1 one hour after its end hour; the running sum
    // over the full hour grid is the concurrency curve. The cumsum window
    // is GLOBAL but calendar-bounded (≤ grid-size rows after the per-hour
    // pre-aggregation — the same justification as r_resample_gapfill's
    // LOCF window): the corpus-sized work is the per-user sessionization
    // shuffle + hour-keyed delta aggs; nothing row-level ever crosses a
    // single partition.
    "r_concurrency_curve" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), unix_millis(col("ts")).as("ms"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      val ses = ev
        .withColumn("new_sess",
          when(col("ms") - lag(col("ms"), 1).over(wOrd) > 1800000L ||
               lag(col("ms"), 1).over(wOrd).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("sh"),
             date_trunc("hour", max(col("ts"))).as("eh"))
        // checkpointed: starts and ends both read it — without this the
        // corpus-wide two-window sessionization executes per consumer
        .transform(Lineage.cut(_))
      val starts = ses.groupBy(col("sh").as("hour"))
        .agg(count(lit(1)).as("n_start"))
      val ends = ses.groupBy(col("eh").as("hour"))
        .agg(count(lit(1)).as("n_end"))
      val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
                          date_trunc("hour", max(col("ts"))).as("h1"))
      val grid = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val wH = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the sweep deltas derive from the already-aggregated hour-keyed
      // frames (+n_start at h, −n_end one hour later) — no third and
      // fourth pass over the session frame
      val curve = grid
        .join(starts, Seq("hour"), "left")
        .join(ends.select((col("hour") + expr("INTERVAL 1 HOUR")).as("hour"),
          col("n_end").as("n_end_prev")), Seq("hour"), "left")
        .join(ends, Seq("hour"), "left")
        .select(col("hour"),
          coalesce(col("n_start"), lit(0L)).as("n_start"),
          coalesce(col("n_end"), lit(0L)).as("n_end"),
          sum(coalesce(col("n_start"), lit(0L)) -
              coalesce(col("n_end_prev"), lit(0L))).over(wH).as("active"))
      // is_peak via a global window max over the SAME single-partition
      // ordering the cumsum already paid for — the old agg + crossJoin
      // duplicated the whole curve subtree (grid bounds scan included)
      // under both consumers (review r20)
      val wAll = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      curve
        .select(col("hour"), col("n_start"), col("n_end"), col("active"),
          (col("active") === max(col("active")).over(wAll)).as("is_peak"))
        .orderBy("hour")
    }),

    // R10/R13 (r11) — trending leaderboard with rank deltas: top-5 parts
    // per ship-month through the NATIVE TopKPerKey operator (bounded
    // per-partition heaps, no per-month sort), then each month's board
    // left-joins the previous month's on (month−1, part) for the rank
    // movement (`new` / `up` / `down` / `flat`). The corpus pays one
    // month/part agg; everything after is leaderboard-sized (k × months).
    // The join is on the top-k frames only — never on the full ranking.
    "q_trending_rank_delta" -> ((s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("month"),
                 col("l_partkey"))
        // per-row quantize THEN exact BIGINT sum (review r20): the old
        // sum(double).cast(long) truncated where DuckDB's CAST rounds —
        // agreement held only because fixture quantities are integral
        // (the q_approx_groupby_ci trap, lines 129-133)
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"))
      val board = graft.plans.TopK.perKey(monthly, keys = Seq("month"),
          order = Seq(graft.plans.TopK.Ord("qty", desc = true),
                      graft.plans.TopK.Ord("l_partkey")), k = 5)
        .select(col("month"), col("l_partkey"), col("qty"),
          col("rk").cast("int").as("rk"))
        .transform(Lineage.cut(_)) // consumed twice (current + shifted previous)
      val prev = board.select(
        add_months(col("month"), 1).as("month"),
        col("l_partkey"), col("rk").as("prev_rk"))
      board.join(prev, Seq("month", "l_partkey"), "left")
        .select(col("month"), col("rk"), col("l_partkey"), col("qty"),
          col("prev_rk"),
          when(col("prev_rk").isNull, lit("new"))
            .when(col("prev_rk") > col("rk"), lit("up"))
            .when(col("prev_rk") < col("rk"), lit("down"))
            .otherwise(lit("flat")).as("movement"))
        .orderBy("month", "rk")
    }),

    // R22/R8 (r11) — Benford first-digit audit: the classic forensic
    // data-quality gate (natural multiplicative quantities follow
    // P(d) = log10(1+1/d); fabricated or truncated feeds don't). Exact
    // integer path to the leading digit: price → cents (floor·100), then
    // digit = n div 10^(len-1) via the decimal string length — no
    // float log10, whose power-of-ten boundaries would be an ulp trap.
    // Shares in basis points vs the Benford expectation (literal
    // constants, floor(log10(1+1/d)·10⁴)); total L1 deviation as the
    // verdict column (uniform-ish synthetic prices are far from Benford —
    // the audit FLAGS this data, which is the point of an audit). One
    // 9-group aggregation pass over the corpus.
    "q_benford" -> ((s, d) => {
      val cents = floor(col("o_totalprice") * 100).cast("long")
      val digit = expr(
        s"""CAST(n div CASE length(CAST(n AS STRING))
              ${(1 to 12).map(l => s"WHEN $l THEN ${"1" + "0" * (l - 1)}L").mkString(" ")}
              END AS INT)""")
      val expBp = "array(3010, 1760, 1249, 969, 791, 669, 579, 511, 457)"
      val byDigit = Tables.orders(s, d)
        .select(cents.as("n"))
        // Benford is defined on positive significands: zero/negative
        // amounts (possible in a corrupt feed) are excluded BEFORE digit
        // extraction — digit 0 would make element_at(expBp, 0) throw on
        // Spark while DuckDB's list index returns NULL, a crash-vs-row
        // divergence on exactly the feeds the audit exists for
        .filter(col("n") >= 1L)
        .select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
        // ≤9 rows read by THREE consumers (tot, l1, the final select) —
        // without the cut the corpus agg subtree is duplicated under
        // each crossJoin and can scan orders up to 4× when exchange
        // reuse doesn't fire (review r20; the t_eval_prf discipline)
        .transform(Lineage.cut(_))
      val tot = byDigit.agg(sum(col("cnt")).as("total"))
      val scored = byDigit.crossJoin(broadcast(tot))
        .select(col("digit"), col("cnt"),
          intDiv(col("cnt") * lit(10000L), col("total")).as("obs_bp"),
          expr(s"CAST(element_at($expBp, digit) AS BIGINT)").as("exp_bp"))
        .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      val l1 = scored.agg(sum(col("dev_bp")).as("total_dev_bp"))
      scored.crossJoin(broadcast(l1))
        .select(col("digit"), col("cnt"), col("obs_bp"), col("exp_bp"),
          col("dev_bp"), col("total_dev_bp"),
          (col("total_dev_bp") <= 1500L).as("benford_like"))
        .orderBy("digit")
    }),

    // R19 (r11) — PCA APPLY (v_pca_power's second half, the train→apply
    // symmetry of v_ivfpq_trained): project every embedding onto the
    // trained principal axis. The axis rides a ONE-ROW broadcast (the
    // scalar-subquery pattern — no driver collect: the single-task
    // iteration's 64 rows fold into one array column via a sorted
    // collect), and each row's coordinate is the exact integer dot
    // product of its milli-quantized components with the axis units —
    // one corpus pass, the projection entirely inside codegen'd HOFs.
    // At 100 TB this is the whitening/rotation pass an IVF-PQ build runs
    // before quantizer training.
    "v_whiten_project" -> ((s, d) => {
      val axis = pcaAxis(s, d)
        .agg(expr(
          """transform(array_sort(collect_list(struct(dim, v_unit))),
               p -> p.v_unit)""").as("axis"))
      Tables.embeddings(s, d)
        .filter(size(col("embedding")) === 64)
        .crossJoin(broadcast(axis))
        .select(col("vec_id"),
          expr(
            """aggregate(zip_with(
                 transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
                 axis, (q, v) -> q * v),
               0L, (acc, x) -> acc + x)""").as("coord_units"))
        .orderBy("vec_id")
    }),

    // R17/R18/R20 (r11) — quality-aware near-dup representative selection:
    // real pipelines keep the BEST member of a near-dup cluster, not the
    // first — d_dedup_cluster's min-doc_id label is arbitrary when members
    // differ in quality (near-dup texts DO differ, so the classifier score
    // discriminates; exact-dup groups would all tie). Clusters come from
    // the shared edge-subgraph components (iteration cost tracks
    // duplicates found, not corpus size); representative = argmax
    // (classifier score units, then min doc_id) per cluster. The naive
    // pick ships alongside — `same_as_naive` makes the policy difference
    // auditable instead of silent.
    "d_dedup_keep_best" -> ((s, d) => {
      val units = scoreUnitsExpr
      val edges = DedupQueries.adjacentJaccard(s, d)
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val labels = ConnectedComponents.ofEdges(edges)
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), units.as("score_units"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("score_units").desc, col("doc_id"))
      labels.join(scored, Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rk") === 1, col("doc_id"))).as("kept_doc_id"),
          max(when(col("rk") === 1, col("score_units"))).as("kept_score_units"),
          min(col("doc_id")).as("naive_doc_id"))
        .withColumn("same_as_naive", col("kept_doc_id") === col("naive_doc_id"))
        .orderBy("cluster_id")
    }),

    // R13/R8 (r11) — seasonality-aware drift: `r_drift_detect` flags any
    // day-over-day movement, but feeds with weekly rhythm (weekend mix ≠
    // weekday mix) need the baseline to be "prior days of the SAME
    // weekday", not yesterday. Each (day, type) share in basis points is
    // compared against the truncating-integer mean of all PRIOR
    // same-weekday shares (an expanding window per (weekday, type) —
    // rows-between-unbounded-and-1-preceding, calendar-sized); the first
    // week has no baseline and is excluded rather than flagged. Shares
    // come off the complete day×type grid so a type absent on one day
    // still contributes its |0 − baseline| deviation.
    "r_drift_seasonal" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      // ONE corpus pass: the day/type aggregate is checkpointed and the
      // grid, totals, and shares all derive from it (the distinct day and
      // type sets of `daily` equal those of the raw events — every
      // present type appears in some day group); building the grid from
      // two raw-event distincts would scan the corpus twice more.
      val daily = ev.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .transform(Lineage.cut(_))
      val grid = daily.select(col("day")).distinct()
        .crossJoin(daily.select(col("event_type")).distinct())
      val tot = daily.groupBy(col("day")).agg(sum(col("cnt")).as("total"))
      val bp = grid
        .join(daily, Seq("day", "event_type"), "left")
        .join(tot, Seq("day"))
        .select(col("day"), col("event_type"), col("total"),
          intDiv(coalesce(col("cnt"), lit(0L)) * lit(10000L), col("total"))
            .as("bp"),
          dayofweek(col("day")).as("weekday"))
      val prior = Window.partitionBy(col("weekday"), col("event_type"))
        .orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      bp
        .withColumn("base_sum", sum(col("bp")).over(prior))
        .withColumn("base_n", count(lit(1)).over(prior))
        .filter(col("base_n") > 0)
        .withColumn("baseline_bp", intDiv(col("base_sum"), col("base_n")))
        .groupBy(col("day"))
        .agg(max(col("weekday")).as("weekday"), max(col("total")).as("total"),
          sum(abs(col("bp") - col("baseline_bp"))).as("l1_bp"))
        .withColumn("drifted", col("l1_bp") > 1000L)
        .orderBy("day")
    }),

    // R19 (r11) — per-dimension quantile normalization: the rank-transform
    // preprocessing step that makes heavy-tailed embedding dimensions
    // comparable before quantization (int8/PQ codebooks train better on
    // uniformized marginals). Each component's rank within its dimension
    // maps to a basis-point quantile (rank−1)·10⁴ div (n−1) — exact
    // integers; ordering is on the raw float values (identical bits in
    // both engines ⇒ identical order) with vec_id as the total-order
    // tie-break. Scale shape: one explode to (dim, value) and a 64-way
    // partitioned rank — each dimension sorts independently, the classic
    // per-feature parallelism; nothing global.
    "v_quantile_norm" -> ((s, d) => {
      val el = Tables.embeddings(s, d)
        .filter(size(col("embedding")) === 64)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), (col("i") + 1).as("dim"),
          col("x").cast("double").as("x"))
      val byDim = Window.partitionBy(col("dim")).orderBy(col("x"), col("vec_id"))
      // per-dim n rides a window over the SAME dim partitioning the rank
      // already shuffles on — the old groupBy + broadcast join was a
      // second full scan + explode of the embeddings table (review r20)
      val wDim = Window.partitionBy(col("dim"))
      el.withColumn("rk", row_number().over(byDim))
        .withColumn("n", count(lit(1)).over(wDim))
        .select(col("vec_id"), col("dim"),
          // single-value dimension (n = 1): quantile defined as 0 rather
          // than a divide-by-zero NULL/error split across engines
          when(col("n") > 1,
            intDiv((col("rk") - 1).cast("long") * lit(10000L),
                   (col("n") - 1).cast("long"))).otherwise(lit(0L))
            .as("quantile_bp"))
        .orderBy("vec_id", "dim")
    }),

    // R17/R18/R20 capstone v3 (r11) — the corpus build re-based on this
    // session's gates: model-based classifier gate (positive hashed-
    // feature score — the fastText stage real pipelines run AFTER
    // heuristics) → near-dup clusters over the SURVIVORS → quality-aware
    // keep-best representative per cluster (not min-id). v1/v2 stay
    // registered unchanged; v3 extends the regression family with the
    // policy modern pipelines actually ship. Output = per-source
    // survivor census (docs + token budget) — the mixing-table input.
    // Every stage is a keyed shuffle or per-row scan; cluster iteration
    // cost tracks duplicates found, not corpus size.
    "d_corpus_build_v3" -> ((s, d) => {
      val units = scoreUnitsExpr
      val gated = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          units.as("score_units"))
        .filter(col("score_units") > 0)
        .transform(Lineage.cut(_)) // consumed by edges-restrict, scoring, and census
      val edges = DedupQueries.adjacentJaccard(s, d)
        .filter(col("jaccard") >= 0.5)
        .join(gated.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(gated.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val labels = ConnectedComponents.ofEdges(edges)
      val w = Window.partitionBy(col("label"))
        .orderBy(col("score_units").desc, col("doc_id"))
      val dropped = labels.join(gated, Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1)
        .select(col("doc_id"))
      gated.join(dropped, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("source")
    }),

    // R10/R17 (r11) — multi-epoch shuffle plan: training needs each epoch
    // to visit every document exactly once in a DIFFERENT pseudo-random
    // order, reproducibly — and a global sort per epoch is exactly what a
    // 100 TB corpus cannot afford. The shuffle-free plan: shard =
    // LCG(doc, epoch) mod S (a hash partition), position = rank within
    // the shard by a second keyed hash — each shard sorts independently
    // (per-shard parallelism, shard size ≈ corpus/S), and determinism
    // makes the schedule resumable mid-epoch. Three epochs emitted; the
    // spec pins the permutation property and that epochs actually differ.
    "d_epoch_shuffle" -> ((s, d) => {
      // doc_id pre-reduced mod 2^31 before the multiply — the raw product
      // overflows Long at doc_id ~3.5e9 (the q_approx_groupby_ci fix
      // applied here too); identical value for every doc_id < 2^31.
      // Per-epoch MULTIPLIER, not a per-epoch addend (review r20): the
      // r11 form `doc*M + epoch*K + C` was affine in epoch, which made
      // every epoch's visit order a cyclic ROTATION of epoch 0's and the
      // shard (low bits, M ≡ 1 mod 8) a pure doc_id round-robin — the
      // spec's "epochs differ" held only because a rotation is
      // technically a different permutation. Distinct odd multipliers
      // (Knuth / xxHash PRIME32_2 / PRIME32_3 — public constants) give
      // genuinely independent multiplicative permutations (simulated at
      // 5k docs: 0/4999 epoch-adjacent pairs preserved, shard
      // co-residence across epochs at the expected 1/8), and the shard
      // comes from the HIGH 3 bits, decoupling it from the multiplier's
      // low-bit structure.
      val m = when(col("epoch") === 0, lit(2654435761L))
        .when(col("epoch") === 1, lit(2246822519L))
        .otherwise(lit(3266489917L))
      val a = when(col("epoch") === 0, lit(12345L))
        .when(col("epoch") === 1, lit(2057L))
        .otherwise(lit(40503L))
      val h = ((col("doc_id") % lit(2147483648L)) * m + a) % lit(2147483648L)
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("sequence(0, 2)")).as("epoch"))
        .withColumn("h", h)
        .withColumn("shard", expr("CAST(h div 268435456 AS INT)"))
        .withColumn("pos", row_number().over(w))
        .select(col("epoch").cast("int").as("epoch"), col("shard"),
          col("doc_id"), col("pos"))
        .orderBy("epoch", "shard", "pos")
    }),

    // R20 (r11) — classifier evaluation report: per-class precision /
    // recall / F1 in integer basis points over the t_lang_id confusion
    // matrix (same `langPred` definition — one classifier, two readouts).
    // Classes = union of actual and predicted labels, so a label that is
    // only ever predicted (or only ever true) still gets a row; metrics
    // are NULL where undefined (no predictions ⇒ no precision) rather
    // than a fake 0 — an eval report that invents numbers for undefined
    // cells is how weak classifiers hide. Confusion matrix is
    // class-squared-sized; one corpus pass.
    "t_eval_prf" -> ((s, d) => {
      val cm = Tables.documents(s, d)
        .select(col("lang"), TextQueries.langPred.as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .transform(Lineage.cut(_)) // class²-sized; read by 4 consumers below
      val classes = cm.select(col("lang").as("cls"))
        .unionByName(cm.select(col("pred").as("cls"))).distinct()
      val tp = cm.filter(col("lang") === col("pred"))
        .select(col("lang").as("cls"), col("n").as("tp"))
      val predN = cm.groupBy(col("pred").as("cls")).agg(sum(col("n")).as("pred_n"))
      val actN = cm.groupBy(col("lang").as("cls")).agg(sum(col("n")).as("actual_n"))
      val p = when(col("pred_n") > 0,
        intDiv(col("tp") * lit(10000L), col("pred_n")))
      val r = when(col("actual_n") > 0,
        intDiv(col("tp") * lit(10000L), col("actual_n")))
      classes
        .join(tp, Seq("cls"), "left")
        .join(predN, Seq("cls"), "left")
        .join(actN, Seq("cls"), "left")
        .select(col("cls"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("pred_n"), lit(0L)).as("pred_n"),
          coalesce(col("actual_n"), lit(0L)).as("actual_n"))
        .withColumn("precision_bp", p)
        .withColumn("recall_bp", r)
        .withColumn("f1_bp",
          when(col("precision_bp").isNotNull && col("recall_bp").isNotNull,
            when(col("precision_bp") + col("recall_bp") > 0,
              intDiv(lit(2L) * col("precision_bp") * col("recall_bp"),
                     col("precision_bp") + col("recall_bp")))
              .otherwise(lit(0L))))
        .orderBy("cls")
    }),

    // R7/R22 (r11) — cross-sectional imputation: fill a row's missing
    // measurement with its ENTITY's median — the feature-table repair
    // step next to r_resample_gapfill's temporal LOCF (time fills from
    // the past; this fills from the entity's own distribution, the
    // standard choice when order is irrelevant). `error` events null the
    // value (the q_ignore_nulls convention); the per-user median
    // (interpolated, identical in both engines, floorRound-pinned) joins
    // back user-keyed. An all-error user keeps NULL after imputation —
    // was_imputed still flags it, so downstream sees attempted-but-
    // unfillable rather than silently-zero.
    "q_impute_group_median" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", lit(null))
          .otherwise(col("value")).as("v"))
      val med = ev.filter(col("v").isNotNull)
        .groupBy(col("user_id"))
        .agg(floorRound(expr("median(v)"), 4).as("user_median"))
      ev.join(med, Seq("user_id"), "left")
        .select(col("user_id"), col("event_id"), col("v"),
          col("user_median"),
          coalesce(col("v"), col("user_median")).as("imputed"),
          col("v").isNull.as("was_imputed"))
        .orderBy("user_id", "event_id")
    }),

    // R13 — calendar resample + LOCF gap fill: build the complete per-user
    // day grid (bounds from a one-row broadcast agg — the scalar-subquery
    // pattern), left-join the observed daily aggregate, and carry the last
    // observation forward over the grid. Grid size = keys × days (a
    // metadata-scale frame, NOT corpus-scale); the corpus pays one
    // grouped-agg pass. The LOCF window scans per-user day rows — bounded
    // by the calendar, so no single-partition risk at any corpus size.
    "r_resample_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bounds = ev.agg(to_date(min(col("ts"))).as("d0"),
                          to_date(max(col("ts"))).as("d1"))
      val grid = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val daily = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(floorRound(avg(col("value")), 4).as("day_avg"),
             count(lit(1)).as("n_events"))
      val locf = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("day_avg"),
          last(col("day_avg"), ignoreNulls = true).over(locf).as("filled"),
          col("day_avg").isNull.as("was_gap"))
        .orderBy("user_id", "day")
    })
  )

  /** Exact-integer division, truncating toward zero — the shared semantics
    * of Spark's `div` and DuckDB's `//` (both truncate; verified on
    * -7/2 = -3 in each). Must be IntegralDivide, not Column `/`: that is
    * double division, which drops ulps beyond 2⁵³ (observed as off-by-one
    * units in the power-iteration renorm).
    */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)).cast("long")
  }


  /** Trained principal-axis core shared by `v_pca_power` (reports it) and
    * `v_whiten_project` (applies it): per-partition Gram partial agg over
    * milli-quantized components, then the 6-step integer power iteration
    * as a single-task replay. Returns one row per dimension:
    * (dim, v_unit, v_prev_unit, max_abs_delta). See the v_pca_power
    * Scaladoc/oracle for the exactness argument (truncating integral
    * division shared by JVM Long `/`, Spark `div`, and DuckDB `//`).
    */
  def pcaAxis(s: SparkSession, d: String): DataFrame = {
    // Gram build: per-partition 64×64 Long accumulators, then a 4096-key
    // merge of the per-partition partials — the classic distributed Gram
    // partial aggregation. The naive alternative (explode 4096
    // (j, k, product) structs per row into a hash agg) shuffles
    // rows×4096 entries and measured ~4-5 s of the query's steady-state
    // at sf0.1; this form exchanges only partitions×4096 integers.
    // Integer partials are order-independent, so parity is exact.
    import s.implicits._
    val quant = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64)
      .select(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("q"))
      .as[Seq[Long]]
    val S = quant
      .mapPartitions { rows =>
        // emit only when the partition saw data: an unconditional emit
        // would turn an EMPTY corpus into a 64-row all-zero "axis" while
        // the oracle returns no rows. Accumulation bound: entries grow
        // ~N·q² with |q| = floor(|x|·1000); for unit-norm-ish embeddings
        // (|x| ≤ ~1 ⇒ q² ≤ ~1e6) the Long limit is reached only past
        // ~9e12 rows (≈ 2 PB of fp32×64) — beyond the design regime; a
        // wider component range needs a max-based pre-pass quantizer
        var seen = false
        val acc = Array.ofDim[Long](64, 64)
        rows.foreach { arr =>
          seen = true
          val a = arr.toArray
          var j = 0
          while (j < 64) {
            val aj = a(j); var k = 0
            while (k < 64) { acc(j)(k) += aj * a(k); k += 1 }
            j += 1
          }
        }
        if (!seen) Iterator.empty
        else Iterator.range(0, 64).flatMap(j =>
          Iterator.range(0, 64).map(k => (j + 1, k + 1, acc(j)(k))))
      }
      .toDF("j", "k", "p")
      .groupBy(col("j"), col("k")).agg(sum(col("p")).as("s"))
    // The 4096-entry matrix is sub-threshold by construction, so the
    // iteration runs as a SINGLE-TASK replay of the integer recurrence
    // (the graph-family endgame discipline): the distributed form —
    // per-step join + agg + max + renorm on 64-row frames — measured
    // ~9-11 s steady-state of pure barrier overhead at sf0.1. The
    // corpus-scale stage (the one-pass Gram build above) stays
    // distributed; JVM Long division truncates toward zero exactly like
    // IntegralDivide LEGACY and DuckDB `//`, and integer sums are
    // order-independent, so this path is bit-equal to the oracle unroll.
    import s.implicits._
    val steps = PcaSteps
    S.as[(Int, Int, Long)]
      .repartition(1)
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty[(Int, Long, Long, Long)]
        else {
        val m = Array.ofDim[Long](64, 64)
        it.foreach { case (j, k, sv) => m(j - 1)(k - 1) = sv }
        // Pre-scale the matrix so the matvec cannot overflow Long: Gram
        // entries grow ~N·q² and w_j = Σ m·v spans 64
        // terms with |v| ≤ ~2.1e6 after renorm, so |m| must stay under
        // ~2³⁴ (64 · 2³⁴·2 · 2.1e6 ≈ 4.6e18 < 2⁶³). Truncating division
        // by a max-derived divisor — identical on both engines (the
        // oracle applies the same `// ds`); ds = 1 at every tested SF, so
        // the rescale is a no-op until the regime that needs it.
        val maxAbsS = m.flatten.map(math.abs).max
        val ds = math.max(maxAbsS / 17179869184L, 1L)
        if (ds > 1L) {
          var j = 0
          while (j < 64) {
            var k = 0
            while (k < 64) { m(j)(k) /= ds; k += 1 }
            j += 1
          }
        }
        var v = Array.fill(64)(1000000L)
        var prev = v
        for (_ <- 1 to steps) {
          val w = Array.tabulate(64) { j =>
            var acc = 0L
            var k = 0
            while (k < 64) { acc += m(j)(k) * v(k); k += 1 }
            acc
          }
          val mx = w.map(math.abs).max
          val dnorm = math.max(mx / 1000000L, 1L)
          prev = v
          v = w.map(_ / dnorm)
        }
        val delta = (0 until 64).map(i => math.abs(v(i) - prev(i))).max
        (0 until 64).iterator.map(i => (i + 1, v(i), prev(i), delta))
        }
      }
      .toDF("dim", "v_unit", "v_prev_unit", "max_abs_delta")
  }

  /** Power-iteration step count for v_pca_power (mirrored in the oracle
    * unroll).
    */
  private val PcaSteps = 6

  /** Distribution-drift core shared by `r_drift_detect` (day buckets) and
    * its STREAMING twin (finalized event-time windows — Round11Spec pins
    * that `StreamingAggs.windowedCounts` output fed here equals the batch
    * path on the same data): takes pre-aggregated (bucket, event_type,
    * cnt) rows and a bucket successor, aligns consecutive buckets per
    * type by full-outer join, and emits the integer basis-point L1
    * distance per bucket with the >1000 bp drift flag.
    */
  /** Bucket-gap semantics, by design: driftCore compares each bucket to
    * its immediate CALENDAR predecessor among observed buckets — a bucket
    * with no predecessor row (feed outage) is itself absent from the
    * report, and its successor scores l1 ≈ 10⁴ (everything "moved" vs an
    * empty day). That is a volume-outage signal wearing a mix-drift flag;
    * feeds where outages are expected should resample onto the full grid
    * first (r_resample_gapfill's shape) so absence is explicit instead.
    */
  def driftCore(counts: DataFrame, bucketCol: String,
                succ: Column => Column): DataFrame = {
    // Both calendar-sized frames are localCheckpoint'd: `daily` feeds
    // tot/bp/bounds and `bp` is self-joined (t vs p) — without the
    // checkpoints the caller's corpus-scale aggregation re-executes ~5
    // times (the q_entity_resolution lesson applied here).
    val daily = counts.withColumnRenamed(bucketCol, "bucket").transform(Lineage.cut(_))
    val tot = daily.groupBy(col("bucket")).agg(sum(col("cnt")).as("total"))
    val bp = daily.join(tot, Seq("bucket"))
      .select(col("bucket"), col("event_type"),
        intDiv(col("cnt") * lit(10000L), col("total")).as("bp"))
      .transform(Lineage.cut(_))
    val bounds = daily.agg(min(col("bucket")).as("b_min"),
                           max(col("bucket")).as("b_max"))
    val t = bp.as("t"); val p = bp.as("p")
    val aligned = t.join(p,
        col("t.bucket") === succ(col("p.bucket")) &&
          col("t.event_type") === col("p.event_type"), "full_outer")
      .select(
        coalesce(col("t.bucket"), succ(col("p.bucket"))).as("bucket"),
        abs(coalesce(col("t.bp"), lit(0L)) - coalesce(col("p.bp"), lit(0L)))
          .as("d_bp"))
    aligned.groupBy(col("bucket")).agg(sum(col("d_bp")).as("l1_bp"))
      .join(tot, Seq("bucket"))
      .crossJoin(broadcast(bounds))
      .filter(col("bucket") > col("b_min") && col("bucket") <= col("b_max"))
      .select(col("bucket").as(bucketCol), col("total"), col("l1_bp"),
        (col("l1_bp") > 1000L).as("drifted"))
      .orderBy(bucketCol)
  }

  /** Shared WITH-prefix of the v_pca_power / v_whiten_project oracles —
    * ONE definition so an iteration fix cannot train different axes in
    * the two oracles. 6-step unroll of the identical integer recurrence;
    * MATERIALIZED throughout — each step reads the previous twice
    * (matvec + renorm) and DuckDB's default CTE inlining would
    * re-evaluate the chain exponentially. `sc`/`s2` mirror the engine's
    * overflow pre-scale (truncating `// ds`, ds = 1 at every tested SF).
    * The caller appends its final CTE + SELECT.
    */
  private def pcaOracle(tail: String): String = {
    val step = (i: Int) =>
      s"""w$i AS MATERIALIZED (
            SELECT s.j, CAST(sum(s.s * v.u) AS BIGINT) AS w
            FROM s2 s JOIN v${i - 1} v ON s.k = v.k GROUP BY s.j),
          m$i AS MATERIALIZED (
            SELECT greatest(max(abs(w)) // 1000000, 1) AS d FROM w$i),
          v$i AS MATERIALIZED (
            SELECT CAST(w.j AS INT) AS k, CAST(w.w // m.d AS BIGINT) AS u
            FROM w$i w, m$i m)"""
    s"""WITH el AS MATERIALIZED (
          SELECT e.vec_id, t.j,
                 CAST(floor(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
                            * 1000) AS BIGINT) AS q
          FROM embeddings e, range(1, 65) t(j)
          WHERE len(e.embedding) = 64),
        s AS MATERIALIZED (
          SELECT CAST(a.j AS INT) AS j, CAST(b.j AS INT) AS k,
                 CAST(sum(a.q * b.q) AS BIGINT) AS s
          FROM el a JOIN el b ON a.vec_id = b.vec_id
          GROUP BY a.j, b.j),
        sc AS (SELECT greatest(max(abs(s)) // 17179869184, 1) AS ds FROM s),
        s2 AS MATERIALIZED (
          SELECT j, k, CAST(s // ds AS BIGINT) AS s FROM s, sc),
        v0 AS MATERIALIZED (
          SELECT CAST(j AS INT) AS k, CAST(1000000 AS BIGINT) AS u
          FROM range(1, 65) t(j)),
        ${(1 to PcaSteps).map(step).mkString(",\n")},
        $tail"""
  }

  private val bucketSql =
    """CAST((strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096 +
            (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256 +
            (strpos('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(t), 4, 1)) - 1) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "t_classifier_score" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
          u AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(($bucketSql * 1103515245 + 12345) % 2048 - 1024)
                        AS BIGINT) AS score_units
            FROM tok GROUP BY doc_id)
          SELECT doc_id, n_tokens, score_units,
                 floor(CAST(score_units AS DOUBLE)
                       / (CAST(n_tokens AS DOUBLE) * 1024.0) * 10000 + 0.5)
                   / 10000 AS score,
                 score_units > 0 AS kept
          FROM u ORDER BY doc_id""",

    "q_approx_groupby_ci" ->
      """WITH base AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(floor(l_quantity + 0.5) AS BIGINT) AS qu,
                  (((l_orderkey * 16 + l_linenumber) % 2147483648)
                    * 1103515245 + 12345)
                    % 2147483648 < 214748365 AS s
           FROM lineitem),
         g AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                  CAST(sum(CASE WHEN s THEN qu ELSE 0 END) * 10 AS BIGINT)
                    AS est_sum_qty,
                  CAST(sum(CASE WHEN s THEN qu * qu ELSE 0 END) AS BIGINT)
                    AS sum_x2,
                  CAST(sum(qu) AS BIGINT) AS exact_sum_qty
           FROM base GROUP BY 1, 2)
         SELECT l_returnflag, l_linestatus, n_sampled, est_sum_qty,
                floor(19.6 * sqrt(CAST(sum_x2 AS DOUBLE) * 0.9) * 100 + 0.5) / 100
                  AS ci_half,
                exact_sum_qty,
                CAST(abs(est_sum_qty - exact_sum_qty) AS DOUBLE) <=
                  floor(19.6 * sqrt(CAST(sum_x2 AS DOUBLE) * 0.9) * 100 + 0.5) / 100
                  AS covered
         FROM g ORDER BY l_returnflag, l_linestatus""",

    "q_entity_resolution" ->
      """WITH ents AS (
           SELECT p_name, CAST(count(*) AS BIGINT) AS support,
                  min(p_partkey) AS canon_key,
                  regexp_extract(p_name, '[^ ]+$') AS block
           FROM part GROUP BY p_name),
         pairs AS (
           SELECT a.block AS block, a.p_name AS name_a, b.p_name AS name_b,
                  a.support + b.support AS pair_support,
                  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
                  least(a.canon_key, b.canon_key) AS merged_key,
                  floor((1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
                         / CAST(greatest(len(a.p_name), len(b.p_name)) AS DOUBLE))
                        * 10000 + 0.5) / 10000 AS sim
           FROM ents a JOIN ents b
             ON a.block = b.block AND a.p_name < b.p_name)
         SELECT block, name_a, name_b, pair_support, edit_dist, merged_key,
                sim, sim >= 0.55 AS is_match
         FROM pairs ORDER BY name_a, name_b""",

    "t_bpe_apply" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
         big AS (
           SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]))
             AS pair
           FROM tok),
         cnt AS (SELECT pair, count(*) AS c FROM big GROUP BY pair),
         rk3 AS (SELECT pair, row_number() OVER (ORDER BY c DESC, pair) AS rk
                 FROM cnt QUALIFY rk <= 3),
         p AS (SELECT max(CASE WHEN rk = 1 THEN pair END) AS p1,
                      max(CASE WHEN rk = 2 THEN pair END) AS p2,
                      max(CASE WHEN rk = 3 THEN pair END) AS p3
               FROM rk3),
         m0 AS (SELECT doc_id, text,
                       ' ' || replace(text, ' ', '  ') || ' ' AS s0, p1, p2, p3
                FROM documents, p),
         m1 AS (SELECT *, CASE WHEN p1 IS NULL THEN s0 ELSE
                    replace(s0, ' ' || replace(p1, ' ', '  ') || ' ',
                                 ' ' || replace(p1, ' ', '§') || ' ') END AS s1
                FROM m0),
         m2 AS (SELECT *, CASE WHEN p2 IS NULL THEN s1 ELSE
                    replace(s1, ' ' || replace(p2, ' ', '  ') || ' ',
                                 ' ' || replace(p2, ' ', '§') || ' ') END AS s2
                FROM m1),
         m3 AS (SELECT *, CASE WHEN p3 IS NULL THEN s2 ELSE
                    replace(s2, ' ' || replace(p3, ' ', '  ') || ' ',
                                 ' ' || replace(p3, ' ', '§') || ' ') END AS s3
                FROM m2),
         fin AS (SELECT doc_id, text, p1, p2, p3,
                        trim(replace(s3, '  ', ' ')) AS merged
                 FROM m3)
         SELECT doc_id, p1, p2, p3,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_before,
                CAST(len(string_split(merged, ' ')) AS BIGINT) AS n_after,
                floor(CAST(len(string_split(merged, ' ')) AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)
                      * 10000 + 0.5) / 10000 AS compression,
                replace(merged, '§', ' ') = text AS reversible
         FROM fin ORDER BY doc_id""",

    // exact columns only — the probabilistic sketch-bound flags are
    // asserted in Round11Spec, never hash-compared (ADVICE r11)
    "q_hll_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         i AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
               FROM a WHERE user_id IN (SELECT user_id FROM b)),
         ca AS (SELECT CAST(count(user_id) AS BIGINT) AS exact_a FROM a),
         cb AS (SELECT CAST(count(user_id) AS BIGINT) AS exact_b FROM b)
         SELECT exact_a, exact_b, exact_inter FROM i, ca, cb""",

    "r_rollup_delta" ->
      """WITH ev AS (
           SELECT CAST(ts AS DATE) AS day, event_type,
                  CAST(floor(value * 10000) AS BIGINT) AS units
           FROM events),
         c AS (SELECT max(day) - 5 AS cut FROM ev),
         base AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS cnt,
                         CAST(sum(units) AS BIGINT) AS sum_units
                  FROM ev, c WHERE day <= cut GROUP BY day, event_type),
         delta AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS cnt,
                          CAST(sum(units) AS BIGINT) AS sum_units
                   FROM ev, c WHERE day > cut GROUP BY day, event_type),
         merged AS (
           SELECT day, event_type, CAST(sum(cnt) AS BIGINT) AS cnt,
                  CAST(sum(sum_units) AS BIGINT) AS sum_units
           FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
           GROUP BY day, event_type),
         full_r AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS cnt_f,
                           CAST(sum(units) AS BIGINT) AS sum_f
                    FROM ev GROUP BY day, event_type)
         SELECT m.day, m.event_type, m.cnt, m.sum_units,
                (m.cnt = f.cnt_f AND m.sum_units = f.sum_f) AS matches_full
         FROM merged m JOIN full_r f
           ON f.day = m.day AND f.event_type = m.event_type
         ORDER BY m.day, m.event_type""",

    "v_pca_power" ->
      pcaOracle(s"""conv AS (
            SELECT CAST(max(abs(a.u - b.u)) AS BIGINT) AS max_abs_delta
            FROM v$PcaSteps a JOIN v${PcaSteps - 1} b ON a.k = b.k)
          SELECT a.k AS dim, a.u AS v_unit, b.u AS v_prev_unit,
                 conv.max_abs_delta
          FROM v$PcaSteps a JOIN v${PcaSteps - 1} b ON a.k = b.k, conv
          ORDER BY dim"""),

    "v_whiten_project" ->
      // the trained-axis unroll, then the exact integer projection:
      // coord = Σ_k floor(e[k]·1000) · v6.u(k) per vector
      pcaOracle(s"""proj AS (
            SELECT el.vec_id,
                   CAST(sum(el.q * v.u) AS BIGINT) AS coord_units
            FROM el JOIN v$PcaSteps v ON v.k = el.j
            GROUP BY el.vec_id)
          SELECT vec_id, coord_units FROM proj ORDER BY vec_id"""),

    "r_drift_detect" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
         daily AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS cnt
                   FROM ev GROUP BY day, event_type),
         tot AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS total
                 FROM daily GROUP BY day),
         bp AS (SELECT d.day, d.event_type,
                       CAST((d.cnt * 10000) // t.total AS BIGINT) AS bp
                FROM daily d JOIN tot t ON t.day = d.day),
         bounds AS (SELECT min(day) AS d_min, max(day) AS d_max FROM ev),
         aligned AS (
           SELECT coalesce(t.day, p.day + 1) AS day,
                  abs(coalesce(t.bp, 0) - coalesce(p.bp, 0)) AS d_bp
           FROM bp t FULL OUTER JOIN bp p
             ON t.day = p.day + 1 AND t.event_type = p.event_type),
         l1 AS (SELECT day, CAST(sum(d_bp) AS BIGINT) AS l1_bp
                FROM aligned GROUP BY day)
         SELECT l1.day, tot.total, l1.l1_bp, l1.l1_bp > 1000 AS drifted
         FROM l1 JOIN tot ON tot.day = l1.day, bounds
         WHERE l1.day > bounds.d_min AND l1.day <= bounds.d_max
         ORDER BY l1.day""",

    "r_concurrency_curve" ->
      """WITH t AS (SELECT user_id, ts, epoch_ms(ts) AS ms FROM events),
         flagged AS (
           SELECT user_id, ts, ms,
                  CASE WHEN ms - lag(ms) OVER w > 1800000
                         OR lag(ms) OVER w IS NULL
                       THEN 1 ELSE 0 END AS new_sess
           FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
         sess AS (
           SELECT user_id, ts,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM flagged),
         ses AS (
           SELECT user_id, session_id,
                  date_trunc('hour', min(ts)) AS sh,
                  date_trunc('hour', max(ts)) AS eh
           FROM sess GROUP BY user_id, session_id),
         starts AS (SELECT sh AS hour, CAST(count(*) AS BIGINT) AS n_start
                    FROM ses GROUP BY sh),
         ends AS (SELECT eh AS hour, CAST(count(*) AS BIGINT) AS n_end
                  FROM ses GROUP BY eh),
         deltas AS (
           SELECT hour, CAST(sum(delta) AS BIGINT) AS delta FROM (
             SELECT sh AS hour, 1 AS delta FROM ses
             UNION ALL
             SELECT eh + INTERVAL 1 HOUR AS hour, -1 AS delta FROM ses)
           GROUP BY hour),
         b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1 FROM t),
         grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS hour FROM b),
         curve AS (
           SELECT g.hour,
                  coalesce(s.n_start, 0) AS n_start,
                  coalesce(e.n_end, 0) AS n_end,
                  CAST(sum(coalesce(d.delta, 0)) OVER (ORDER BY g.hour
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
           FROM grid g
           LEFT JOIN starts s ON s.hour = g.hour
           LEFT JOIN ends e ON e.hour = g.hour
           LEFT JOIN deltas d ON d.hour = g.hour)
         SELECT hour, n_start, n_end, active,
                active = max(active) OVER () AS is_peak
         FROM curve ORDER BY hour""",

    "q_trending_rank_delta" ->
      """WITH monthly AS (
           SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month, l_partkey,
                  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
           FROM lineitem GROUP BY 1, 2),
         board AS (
           SELECT month, l_partkey, qty,
                  CAST(row_number() OVER (PARTITION BY month
                         ORDER BY qty DESC, l_partkey) AS INT) AS rk
           FROM monthly QUALIFY rk <= 5)
         SELECT b.month, b.rk, b.l_partkey, b.qty, p.rk AS prev_rk,
                CASE WHEN p.rk IS NULL THEN 'new'
                     WHEN p.rk > b.rk THEN 'up'
                     WHEN p.rk < b.rk THEN 'down'
                     ELSE 'flat' END AS movement
         FROM board b LEFT JOIN board p
           ON CAST(p.month + INTERVAL 1 MONTH AS DATE) = b.month
          AND p.l_partkey = b.l_partkey
         ORDER BY b.month, b.rk""",

    "q_benford" ->
      """WITH cents AS (
           SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS n FROM orders
           WHERE CAST(floor(o_totalprice * 100) AS BIGINT) >= 1),
         dig AS (
           SELECT CAST(n // CASE len(CAST(n AS VARCHAR))
                    WHEN 1 THEN 1 WHEN 2 THEN 10 WHEN 3 THEN 100
                    WHEN 4 THEN 1000 WHEN 5 THEN 10000 WHEN 6 THEN 100000
                    WHEN 7 THEN 1000000 WHEN 8 THEN 10000000
                    WHEN 9 THEN 100000000 WHEN 10 THEN 1000000000
                    WHEN 11 THEN 10000000000 WHEN 12 THEN 100000000000
                    END AS INT) AS digit
           FROM cents),
         byd AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt
                 FROM dig GROUP BY digit),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM byd),
         scored AS (
           SELECT digit, cnt,
                  CAST((cnt * 10000) // total AS BIGINT) AS obs_bp,
                  CAST([3010, 1760, 1249, 969, 791, 669, 579, 511, 457][digit]
                       AS BIGINT) AS exp_bp
           FROM byd, tot),
         dev AS (SELECT *, abs(obs_bp - exp_bp) AS dev_bp FROM scored),
         l1 AS (SELECT CAST(sum(dev_bp) AS BIGINT) AS total_dev_bp FROM dev)
         SELECT digit, cnt, obs_bp, exp_bp, dev_bp, total_dev_bp,
                total_dev_bp <= 1500 AS benford_like
         FROM dev, l1 ORDER BY digit""",

    "d_dedup_keep_best" ->
      s"""WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS doc_a, CAST(count(*) AS BIGINT) AS i
           FROM tok a JOIN tok b ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
           GROUP BY a.doc_id),
         edge AS (
           SELECT doc_a FROM inter
             JOIN sz sa ON sa.doc_id = doc_a
             JOIN sz sb ON sb.doc_id = doc_a + 1
           WHERE floor((CAST(i AS DOUBLE) / (sa.n + sb.n - i)) * 10000 + 0.5) / 10000 >= 0.5),
         marks AS (
           SELECT d.doc_id,
                  CASE WHEN e.doc_a IS NULL THEN d.doc_id END AS start_id
           FROM documents d LEFT JOIN edge e ON e.doc_a = d.doc_id - 1),
         comp AS (
           SELECT doc_id,
                  max(start_id) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_id
           FROM marks),
         bag AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         score AS (
           SELECT doc_id,
                  CAST(sum(($bucketSql * 1103515245 + 12345) % 2048 - 1024)
                       AS BIGINT) AS score_units
           FROM bag GROUP BY doc_id),
         mem AS (
           SELECT c.doc_id, c.cluster_id, s.score_units,
                  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY s.score_units DESC, c.doc_id) AS rk,
                  min(c.doc_id) OVER (PARTITION BY cluster_id) AS naive_doc_id
           FROM comp c JOIN score s ON s.doc_id = c.doc_id)
         SELECT cluster_id, n_members, doc_id AS kept_doc_id,
                score_units AS kept_score_units, naive_doc_id,
                doc_id = naive_doc_id AS same_as_naive
         FROM mem WHERE rk = 1 AND n_members > 1
         ORDER BY cluster_id""",

    "r_drift_seasonal" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
         grid AS (SELECT d.day, t.event_type
                  FROM (SELECT DISTINCT day FROM ev) d,
                       (SELECT DISTINCT event_type FROM ev) t),
         daily AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS cnt
                   FROM ev GROUP BY day, event_type),
         tot AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS total
                 FROM daily GROUP BY day),
         bp AS (
           SELECT g.day, g.event_type, tot.total,
                  CAST((coalesce(d.cnt, 0) * 10000) // tot.total AS BIGINT) AS bp,
                  CAST(dayofweek(g.day) + 1 AS INT) AS weekday
           FROM grid g
           LEFT JOIN daily d ON d.day = g.day AND d.event_type = g.event_type
           JOIN tot ON tot.day = g.day),
         based AS (
           SELECT *,
                  sum(bp) OVER w AS base_sum,
                  count(*) OVER w AS base_n
           FROM bp
           WINDOW w AS (PARTITION BY weekday, event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT day, CAST(max(weekday) AS INT) AS weekday,
                CAST(max(total) AS BIGINT) AS total,
                CAST(sum(abs(bp - CAST(base_sum // base_n AS BIGINT))) AS BIGINT)
                  AS l1_bp,
                CAST(sum(abs(bp - CAST(base_sum // base_n AS BIGINT))) AS BIGINT)
                  > 1000 AS drifted
         FROM based WHERE base_n > 0
         GROUP BY day ORDER BY day""",

    "v_quantile_norm" ->
      """WITH el AS (
           SELECT vec_id, CAST(t.i AS INT) AS dim,
                  CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
           FROM embeddings, range(1, 65) t(i)
           WHERE len(embedding) = 64),
         n AS (SELECT dim, CAST(count(*) AS BIGINT) AS n FROM el GROUP BY dim),
         rk AS (
           SELECT vec_id, dim,
                  row_number() OVER (PARTITION BY dim ORDER BY x, vec_id) AS rk
           FROM el)
         SELECT rk.vec_id, rk.dim,
                CASE WHEN n.n > 1
                     THEN CAST(((rk.rk - 1) * 10000) // (n.n - 1) AS BIGINT)
                     ELSE 0 END AS quantile_bp
         FROM rk JOIN n ON n.dim = rk.dim
         ORDER BY rk.vec_id, rk.dim""",

    "d_corpus_build_v3" ->
      s"""WITH bag AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents),
         score AS (
           SELECT doc_id,
                  CAST(sum(($bucketSql * 1103515245 + 12345) % 2048 - 1024)
                       AS BIGINT) AS score_units,
                  CAST(count(*) AS BIGINT) AS n_tokens
           FROM bag GROUP BY doc_id),
         gated AS (
           SELECT d.doc_id, d.source, s.n_tokens, s.score_units
           FROM documents d JOIN score s ON s.doc_id = d.doc_id
           WHERE s.score_units > 0),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS doc_a, CAST(count(*) AS BIGINT) AS i
           FROM tok a JOIN tok b ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
           GROUP BY a.doc_id),
         edge AS (
           SELECT doc_a FROM inter
             JOIN sz sa ON sa.doc_id = doc_a
             JOIN sz sb ON sb.doc_id = doc_a + 1
           WHERE floor((CAST(i AS DOUBLE) / (sa.n + sb.n - i)) * 10000 + 0.5) / 10000 >= 0.5
             AND doc_a IN (SELECT doc_id FROM gated)
             AND doc_a + 1 IN (SELECT doc_id FROM gated)),
         marks AS (
           SELECT g.doc_id,
                  CASE WHEN e.doc_a IS NULL THEN g.doc_id END AS start_id
           FROM gated g LEFT JOIN edge e ON e.doc_a = g.doc_id - 1),
         comp AS (
           SELECT doc_id,
                  max(start_id) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_id
           FROM marks),
         ranked AS (
           SELECT c.doc_id, c.cluster_id,
                  row_number() OVER (PARTITION BY c.cluster_id
                    ORDER BY g.score_units DESC, c.doc_id) AS rk
           FROM comp c JOIN gated g ON g.doc_id = c.doc_id)
         SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(g.n_tokens) AS BIGINT) AS n_tokens
         FROM gated g JOIN ranked r ON r.doc_id = g.doc_id
         WHERE r.rk = 1
         GROUP BY g.source ORDER BY g.source""",

    "d_epoch_shuffle" ->
      """WITH base AS (
           SELECT doc_id, unnest(generate_series(0, 2)) AS epoch
           FROM documents),
         hashed AS (
           SELECT CAST(epoch AS INT) AS epoch, doc_id,
                  ((doc_id % 2147483648) *
                     CASE epoch WHEN 0 THEN 2654435761
                                WHEN 1 THEN 2246822519
                                ELSE 3266489917 END
                   + CASE epoch WHEN 0 THEN 12345
                                WHEN 1 THEN 2057
                                ELSE 40503 END)
                    % 2147483648 AS h
           FROM base),
         sharded AS (
           SELECT epoch, doc_id, h, CAST(h // 268435456 AS INT) AS shard
           FROM hashed)
         SELECT epoch, shard, doc_id,
                CAST(row_number() OVER (PARTITION BY epoch, shard
                       ORDER BY h, doc_id) AS INT) AS pos
         FROM sharded
         ORDER BY epoch, shard, pos""",

    "t_eval_prf" ->
      s"""WITH cm AS (
           SELECT lang, ${TextQueries.langPredSql} AS pred,
                  CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
         classes AS (
           SELECT DISTINCT cls FROM (
             SELECT lang AS cls FROM cm UNION ALL SELECT pred FROM cm)),
         tp AS (SELECT lang AS cls, n AS tp FROM cm WHERE lang = pred),
         predn AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS pred_n
                   FROM cm GROUP BY pred),
         actn AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS actual_n
                  FROM cm GROUP BY lang),
         base AS (
           SELECT c.cls,
                  coalesce(tp.tp, 0) AS tp,
                  coalesce(predn.pred_n, 0) AS pred_n,
                  coalesce(actn.actual_n, 0) AS actual_n
           FROM classes c
           LEFT JOIN tp ON tp.cls = c.cls
           LEFT JOIN predn ON predn.cls = c.cls
           LEFT JOIN actn ON actn.cls = c.cls),
         m AS (
           SELECT *,
                  CASE WHEN pred_n > 0
                       THEN CAST((tp * 10000) // pred_n AS BIGINT) END
                    AS precision_bp,
                  CASE WHEN actual_n > 0
                       THEN CAST((tp * 10000) // actual_n AS BIGINT) END
                    AS recall_bp
           FROM base)
         SELECT cls, tp, pred_n, actual_n, precision_bp, recall_bp,
                CASE WHEN precision_bp IS NOT NULL AND recall_bp IS NOT NULL
                     THEN CASE WHEN precision_bp + recall_bp > 0
                               THEN CAST((2 * precision_bp * recall_bp)
                                         // (precision_bp + recall_bp) AS BIGINT)
                               ELSE 0 END END AS f1_bp
         FROM m ORDER BY cls""",

    "q_impute_group_median" ->
      """WITH ev AS (
           SELECT user_id, event_id,
                  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
           FROM events),
         med AS (
           SELECT user_id,
                  floor(median(v) * 10000 + 0.5) / 10000 AS user_median
           FROM ev WHERE v IS NOT NULL GROUP BY user_id)
         SELECT ev.user_id, ev.event_id, ev.v, med.user_median,
                coalesce(ev.v, med.user_median) AS imputed,
                ev.v IS NULL AS was_imputed
         FROM ev LEFT JOIN med ON med.user_id = ev.user_id
         ORDER BY ev.user_id, ev.event_id""",

    "r_resample_gapfill" ->
      """WITH b AS (
           SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
           FROM events),
         u AS (SELECT DISTINCT user_id FROM events),
         g AS (
           SELECT user_id,
                  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS day
           FROM u, b),
         dl AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
                  floor(avg(value) * 10000 + 0.5) / 10000 AS day_avg,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT g.user_id, g.day,
                coalesce(dl.n_events, 0) AS n_events,
                dl.day_avg,
                last_value(dl.day_avg IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
                dl.day_avg IS NULL AS was_gap
         FROM g LEFT JOIN dl
           ON dl.user_id = g.user_id AND dl.day = g.day
         ORDER BY g.user_id, g.day"""
  )
}
