package graft

import graft.operators.Round15Queries

/** Round-15 operators: line-level boilerplate dedup (the C4 repeated-line
  * scrub — VERDICT r14 #6).
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  // texts are multiples of 3 tokens so the synthesized 3-token lines
  // align exactly with the phrases planted below
  private val nav = "home about contact" // the shared nav-menu line

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Round15Queries.lineDedup(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("d_line_dedup: a nav-menu line shared by 4 docs is dropped from all, bodies survive in order") {
    val docs = Seq(
      (0L, s"$nav alpha beta gamma delta epsilon zeta"),
      (1L, s"eta theta iota $nav kappa lambda mu"),
      (2L, s"nu xi omicron pi rho sigma $nav"),
      (3L, s"$nav tau upsilon phi"))
    val out = run(docs)
    // the nav line (> MaxDocsPerLine = 2 docs) is gone from every doc;
    // each doc's unique body lines survive in original order
    assert(out(0L) === ((3L, 2L, "alpha beta gamma delta epsilon zeta")))
    assert(out(1L) === ((3L, 2L, "eta theta iota kappa lambda mu")))
    assert(out(2L) === ((3L, 2L, "nu xi omicron pi rho sigma")))
    assert(out(3L) === ((2L, 1L, "tau upsilon phi")))
  }

  test("d_line_dedup: a line in exactly MaxDocsPerLine docs survives (quotation, not chrome)") {
    val quote = "to be or"
    val docs = Seq(
      (0L, s"$quote alpha beta gamma"),
      (1L, s"delta epsilon zeta $quote"),
      (2L, "eta theta iota"))
    val out = run(docs)
    assert(out(0L) === ((2L, 2L, s"$quote alpha beta gamma")))
    assert(out(1L) === ((2L, 2L, s"delta epsilon zeta $quote")))
    assert(out(2L) === ((1L, 1L, "eta theta iota")))
  }

  test("d_line_dedup: within-doc repetition counts ONE doc — a refrain is not cross-doc boilerplate") {
    val refrain = "row your boat"
    val docs = Seq(
      // doc 0 repeats its refrain 3 times; only 1 other doc shares it,
      // so ndocs = 2 <= cut and every copy survives
      (0L, s"$refrain $refrain $refrain"),
      (1L, s"$refrain alpha beta gamma"),
      (2L, "delta epsilon zeta"))
    val out = run(docs)
    assert(out(0L) === ((3L, 3L, s"$refrain $refrain $refrain")))
    assert(out(1L) === ((2L, 2L, s"$refrain alpha beta gamma")))
  }

  test("d_line_dedup: an all-boilerplate doc reconstructs to the empty string but keeps its row") {
    val docs = Seq(
      (0L, nav),
      (1L, nav),
      (2L, nav),
      (3L, s"$nav alpha beta gamma"))
    val out = run(docs)
    assert(out(0L) === ((1L, 0L, "")))
    assert(out(3L) === ((2L, 1L, "alpha beta gamma")))
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
  }

  test("d_line_dedup: ragged tails segment as their own (shorter) final line") {
    // 7 tokens -> lines "a b c", "d e f", "g"; the 1-token tail "g" is a
    // line of its own and shared tails cut like any other line
    val docs = Seq(
      (0L, "a b c d e f g"),
      (1L, "x y z p q r g"),
      (2L, "u v w s t o g"))
    val out = run(docs)
    assert(out(0L) === ((3L, 2L, "a b c d e f")))
    assert(out(1L) === ((3L, 2L, "x y z p q r")))
    assert(out(2L) === ((3L, 2L, "u v w s t o")))
  }

  test("d_line_dedup: newlineSplit mode segments on real \\n lines and reconstructs with \\n") {
    // real-corpus mode (VERDICT r16 #6): docs carry actual newline-
    // delimited lines of varying token counts; the cookie banner shared
    // by 3 docs drops everywhere, bodies re-join with '\n' in order
    val banner = "accept all cookies to continue"
    val docs = Seq(
      (0L, s"$banner\nthe first body line\nsecond body line here"),
      (1L, s"opening remarks\n$banner\nclosing remarks"),
      (2L, s"a standalone essay paragraph\n$banner"),
      (3L, "unrelated document with no banner"))
    val out = Round15Queries.lineDedup(
        docs.toDF("doc_id", "text"), newlineSplit = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) === ((3L, 2L, "the first body line\nsecond body line here")))
    assert(out(1L) === ((3L, 2L, "opening remarks\nclosing remarks")))
    assert(out(2L) === ((2L, 1L, "a standalone essay paragraph")))
    assert(out(3L) === ((1L, 1L, "unrelated document with no banner")))
  }

  test("d_line_dedup: newlineSplit all-boilerplate doc keeps its row, empty reconstruction") {
    val banner = "share on social media"
    val docs = Seq(
      (0L, banner), (1L, banner), (2L, banner),
      (3L, s"$banner\nreal content survives"))
    val out = Round15Queries.lineDedup(
        docs.toDF("doc_id", "text"), newlineSplit = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) === ((1L, 0L, "")))
    assert(out(3L) === ((2L, 1L, "real content survives")))
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
  }

  // ---- v_ivf_retrain ----------------------------------------------------

  test("v_ivf_retrain: planted seed skew trips the census; 2-step Lloyd retrain clears it") {
    import org.apache.spark.sql.functions.{col, count, lit}
    graft.plans.GraftFunctions.register(spark)
    def vec(parts: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(64)(0.0)
      parts.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    // stride-4 seeds land pathologically: seed 0 sits ON cluster A
    // (axis 0) and captures EVERYTHING (cluster B at axis 1 has cosine 0
    // to it but NEGATIVE/zero cosine to the other two seeds), while seeds
    // 4 and 8 point away from all mass and capture only themselves —
    // the one-bloated-cell shape the census exists to catch
    val aIds = Iterator.from(1).filter(_ % 4 != 0).take(30).map(_.toLong).toSeq
    val bIds = Iterator.from(200).filter(_ % 4 != 0).take(30).map(_.toLong).toSeq
    val rows =
      Seq(0L -> vec(0 -> 1.0),
          4L -> vec(0 -> 0.8, 1 -> -0.6),
          8L -> vec(0 -> 0.8, 2 -> -0.6),
          // id 12 completes the 0..15 PQ codebook range; as a seed it is
          // axis-0 like seed 0, ties lose to the lower cell id, so it
          // captures NOTHING and drops out of the census (empty cells
          // vanish — the lloydStep contract), keeping k = 3
          12L -> vec(0 -> 1.0)) ++
        aIds.map(_ -> vec(0 -> 1.0)) ++ bIds.map(_ -> vec(1 -> 1.0))
    val e = rows.toDF("vec_id", "v")
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("v")))

    val audit = Round15Queries.ivfRetrainAudit(e, seedStride = 4, steps = 2)
      .collect().head
    // pre: 62 of 64 vectors in seed 0's cell, medians starved -> trip
    assert(audit.getAs[Long]("n_cells_pre") === 3L)
    assert(audit.getAs[Long]("max_n_pre") === 62L)
    assert(audit.getAs[Long]("med2_pre") === 2L)
    assert(audit.getAs[Boolean]("rebalance_pre"),
      s"planted skew must trip the census: $audit")
    // post: the 2-step Lloyd retrain pulls one centroid onto each
    // cluster; the flag clears and the integer verdict records it
    assert(!audit.getAs[Boolean]("rebalance_post"),
      s"retrain must clear the rebalance flag: $audit")
    assert(audit.getAs[Boolean]("improved"), s"skew must not worsen: $audit")
    assert(audit.getAs[Long]("max_n_post") * audit.getAs[Long]("med2_pre") <
      audit.getAs[Long]("max_n_pre") * audit.getAs[Long]("med2_post"),
      s"skew ratio must strictly drop on this fixture: $audit")

    // the re-encoded codes ARE the post-census population: per-cell
    // counts over the annotated frame reproduce the audit's globals, and
    // every vector carries a packed PQ code against the unchanged codebook
    val (_, codes) = Round15Queries.ivfRetrainEncode(e, seedStride = 4, steps = 2)
    val byCell = codes.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell.size.toLong === audit.getAs[Long]("n_cells_post"))
    assert(byCell.values.max === audit.getAs[Long]("max_n_post"))
    assert(codes.count() === 64L)
    assert(codes.filter(col("pq_code").isNull).count() === 0L)
  }
}
