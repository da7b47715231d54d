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
}
