package graft

import graft.operators.Round14Queries

/** Round-14 operators: held-out bigram LM scoring, corpus snapshot diff. */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  // ---- t_lm_score -----------------------------------------------------

  test("t_lm_score: planted bigram counts, smoothing, and integer NLL fold") {
    // train: doc 0 "a b a b" -> c2 {(a,b):2, (b,a):1}; doc 2 "c d" ->
    // {(c,d):1}; c1 {a:2, b:1, c:1}; V = |{a,b,c,d}| = 4
    val train = Seq((0L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    // scored doc 1 "a b x": P(b|a) = (2+1)/(2+4) = 1/2 -> u = 6931;
    //                       P(x|b) = (0+1)/(1+4) = 1/5 -> u = 16094
    // scored doc 3 "x y": context x unseen -> P = (0+1)/(0+4) -> u = 13863
    val scored = Seq((1L, "a b x"), (3L, "x y")).toDF("doc_id", "text")
    val rows = Round14Queries.lmScore(train, scored).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows(1L) === ((2L, 23025L, 11512L, false)), rows(1L).toString)
    assert(rows(3L) === ((1L, 13863L, 13863L, false)), rows(3L).toString)
  }

  test("t_lm_score: unseen-context docs against a wide vocab trip the high-ppl flag") {
    // V = 40 distinct train tokens; a scored doc of entirely unseen
    // bigrams floors at P = 1/(0+40) -> u = ln(40)*1e4 = 36889 > 34300
    val train = Seq((0L, (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val scored = Seq((1L, "zz yy xx"), (3L, "w0 w1 w2")).toDF("doc_id", "text")
    val rows = Round14Queries.lmScore(train, scored).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows(1L) === ((36889L, true)),
      s"fully-OOV doc must flag: ${rows(1L)}")
    // doc 3's bigrams are SEEN (w0 w1, w1 w2 each occur once in train):
    // P = (1+1)/(1+40) -> u = ln(20.5)*1e4 = 30204 < 34300 -> unflagged
    assert(rows(3L) === ((30204L, false)), rows(3L).toString)
  }

  test("t_lm_score: short docs score no bigrams and are absent") {
    val train = Seq((0L, "a b")).toDF("doc_id", "text")
    val scored = Seq((1L, "solo"), (3L, "a b")).toDF("doc_id", "text")
    val ids = Round14Queries.lmScore(train, scored).select("doc_id")
      .as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  // ---- v_embedding_drift ----------------------------------------------

  test("v_embedding_drift: identical distributions stay under the CLT null; a planted shift alarms") {
    def axis(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i % 64) 1.0 else 0.0)
    // ref and cur cycle the same 64 axis vectors -> identical centroids,
    // shift exactly 0, well under the 3-sigma limit
    val ref = (0 until 128).map(i => (i.toLong * 2, axis(i))).toDF("vec_id", "v")
    val same = (0 until 128).map(i => (i.toLong * 2 + 1, axis(i))).toDF("vec_id", "v")
    val calm = graft.operators.Round14Queries.embeddingDrift(ref, same).head()
    assert(calm.getAs[Long]("mean_shift_u6") === 0L)
    assert(calm.getAs[Long]("shift_limit_u6") > 0L)
    assert(!calm.getAs[Boolean]("drifted"))
    assert(calm.getAs[Long]("norm_delta_u4") === 0L, "unit vectors both halves")
    // drifted current: every vector collapses onto axis 0 -> centroid
    // moves from the uniform mixture to e0, shift ~0.98 >> limit ~0.42
    val bad = (0 until 128).map(i => (i.toLong * 2 + 1, axis(0))).toDF("vec_id", "v")
    val hot = graft.operators.Round14Queries.embeddingDrift(ref, bad).head()
    assert(hot.getAs[Boolean]("drifted"),
      s"collapsed distribution must alarm: $hot")
    assert(hot.getAs[Long]("mean_shift_u6") > hot.getAs[Long]("shift_limit_u6"))
  }

  // ---- simhash two-level overflow recovery (r14 fix) -------------------

  /** Hand-built banded-signature rows (doc_id, sh, n, m, band, h, __sz)
    * — the exact frame the recovery stage consumes, with band bytes fully
    * controlled instead of reverse-engineering simhash inputs.
    */
  private def rankedRows(bByte1: Long): org.apache.spark.sql.DataFrame = {
    // bucket (band 0, h = 5) flooded by three mutually-distant fillers
    // (byte1 = 9, pairwise hamming 32 >> their τ) with LOW doc_ids, plus
    // the true near-dup pair A=10 / B=11 (hamming 1, τ(20 tokens) = 13)
    def f(hi: Int): Long = (0xFFFFL << (16 * hi)) | (9L << 8) | 5L
    val shA = (7L << 8) | 5L
    val shB = ((7L << 8) | 5L) ^ (1L << 16)
    val shB2 = (bByte1 << 8) | 5L // variant: B's next-band byte overridden
    Seq(
      (1L, f(1), 100, 98, 0, 5L, 5L),
      (2L, f(2), 100, 98, 0, 5L, 5L),
      (3L, f(3), 100, 98, 0, 5L, 5L),
      (10L, shA, 20, 18, 0, 5L, 5L),
      (11L, if (bByte1 == 7L) shB else shB2, 20, 18, 0, 5L, 5L)
    ).toDF("doc_id", "sh", "n", "m", "band", "h", "__sz")
  }

  test("simhash overflow recovery: a capped-out pair survives via a clean wide band") {
    // cap 2: every member of the size-5 bucket routes to recovery; in the
    // r20 widened scheme A and B meet ALONE in wide band (0,1) with key
    // (5,7) — the fillers carry (5,9) — and pair; the fillers' own wide
    // buckets cap and their mutual hamming fails τ anyway
    val pairs = graft.operators.DedupQueries
      .simhashOverflowCandidates(rankedRows(7L), cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)))
  }

  test("simhash overflow recovery: a pair the OLD adjacent-byte L2 missed is recovered via a wide band (r20)") {
    // B = A with one bit flipped IN BAND 1 (bByte1 = 6 vs A's 7, hamming
    // 1): the r14 recovery keyed flooded band-0 members by the band-1
    // byte, so A (…,7) and B (…,6) landed in DIFFERENT sub-buckets and
    // the pair was lost. The r20 wide-band scheme pairs them in any
    // (0, y≥2) composite — key (5, 0), shared with two zero-byte fillers
    // per composite, hence cap 4 (the L1 bucket, size 5, still
    // overflows) so neither A nor B ranks out.
    val pairs = graft.operators.DedupQueries
      .simhashOverflowCandidates(rankedRows(6L), cap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)))
  }

  test("simhash overflow recovery: no overflow, no recovery rows") {
    val pairs = graft.operators.DedupQueries
      .simhashOverflowCandidates(rankedRows(7L), cap = 5)
      .collect()
    assert(pairs.isEmpty, "cap >= bucket size must route nothing to recovery")
  }

  test("simhash overflow recovery: a pair the flood follows into L2 stays the observed residual") {
    // B's band-1 byte now matches the FILLERS (9): every wide band A and
    // B agree on (all pairs avoiding band 1) is shared by at least one
    // lower-id filler — the three fillers' FF-byte positions ({2,3},
    // {4,5}, {6,7}) can't all be excluded by one band pair — so B ranks
    // past the L2 cap in each, and the surviving filler×A candidates
    // fail τ. The honest residual the simhash_bucket_overflow_l2 metric
    // exists to report.
    val pairs = graft.operators.DedupQueries
      .simhashOverflowCandidates(rankedRows(9L), cap = 2)
      .collect()
    assert(pairs.isEmpty)
  }

  // ---- d_snapshot_diff ------------------------------------------------

  test("d_snapshot_diff: added / removed / changed / unchanged all classified") {
    val a = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "alpha"), (2L, "bravo EDITED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val rows = Round14Queries.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L) === (("unchanged", 1L)))
    assert(rows(2L) === (("changed", 1L)))
    assert(rows(3L) === (("removed", 1L)), "doc only in the previous release")
    assert(rows(4L) === (("added", 1L)), "doc only in the candidate")
  }
}
