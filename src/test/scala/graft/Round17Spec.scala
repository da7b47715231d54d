package graft

import graft.operators.Round17Queries

/** Round-17 operator: span-level language segmentation (`t_lang_spans` —
  * the code-switch detector between doc-level language ID and
  * per-language corpus routing).
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  // windows are 5 tokens; build texts from 5-token phrases so the planted
  // language structure aligns exactly with the classification windows
  private val en1 = "the cat sat down here"      // has marker "the"
  private val en2 = "take a look at this"        // has marker "a"
  private val xx1 = "zork blem fronk glip vemp"  // no markers
  private val xx2 = "quon drel smip vark tolg"   // no markers

  private def spans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, String, Long)] =
    Round17Queries.langSpans(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq

  test("t_lang_spans: adjacent same-language windows merge; a switch starts a new span") {
    // doc 0: en en | other other | en  → three spans
    val out = spans(Seq((0L, s"$en1 $en2 $xx1 $xx2 $en1")))
    assert(out === Seq(
      (0L, 0L, 1L, "en", 2L),
      (0L, 2L, 3L, "other", 2L),
      (0L, 4L, 4L, "en", 1L)), out.toString)
  }

  test("t_lang_spans: a uniform document is one span; a one-window insertion gets its own") {
    val uniform = spans(Seq((0L, s"$en1 $en2 $en1")))
    assert(uniform === Seq((0L, 0L, 2L, "en", 3L)), uniform.toString)
    // the English boilerplate frame around a foreign body — the shape the
    // operator exists for
    val framed = spans(Seq((1L, s"$en1 $xx1 $xx2 $xx1 $en2")))
    assert(framed === Seq(
      (1L, 0L, 0L, "en", 1L),
      (1L, 1L, 3L, "other", 3L),
      (1L, 4L, 4L, "en", 1L)), framed.toString)
  }

  test("t_lang_spans: a ragged tail window classifies on its own tokens") {
    // 7 tokens → windows [the cat sat down here][glip vemp]: en then other
    val out = spans(Seq((0L, s"$en1 glip vemp")))
    assert(out === Seq(
      (0L, 0L, 0L, "en", 1L),
      (0L, 1L, 1L, "other", 1L)), out.toString)
  }

  test("t_lang_spans: spans are per-document — island arithmetic never crosses doc_id") {
    val out = spans(Seq(
      (0L, s"$en1 $xx1"),
      (1L, s"$xx2 $en2")))
    assert(out === Seq(
      (0L, 0L, 0L, "en", 1L),
      (0L, 1L, 1L, "other", 1L),
      (1L, 0L, 0L, "other", 1L),
      (1L, 1L, 1L, "en", 1L)), out.toString)
  }
}
