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

  test("t_lang_spans: the five-language lexicon labels genuine de/es/fr/zh spans (VERDICT r17 #6)") {
    // 5-token phrases built from each language's marker set plus filler —
    // the upgraded lexicon must label each window with ITS language, not
    // collapse everything to en/other as the 2-token set did
    val de = "der hund ist nicht hier"
    val es = "el gato esta con ellos"
    val fr = "le chat est dans paris"
    val zh = "的 是 了 在 和"
    val out = spans(Seq((0L, s"$en1 $de $es $fr $zh $xx1")))
    assert(out === Seq(
      (0L, 0L, 0L, "en", 1L),
      (0L, 1L, 1L, "de", 1L),
      (0L, 2L, 2L, "es", 1L),
      (0L, 3L, 3L, "fr", 1L),
      (0L, 4L, 4L, "zh", 1L),
      (0L, 5L, 5L, "other", 1L)), out.toString)
  }

  test("langPred: doc-level argmax picks the majority language; ties break by lexicon order; no markers is unk") {
    import org.apache.spark.sql.functions.col
    val preds = Seq(
      (0L, "der hund ist nicht auf der couch und sich"), // de-dominant
      (1L, "le chat est dans une maison pour vous"),     // fr-dominant
      (2L, "的 是 了 没有 别的"),                          // zh
      (3L, "the der hund is ist"),                       // en 2 vs de 2 tie → en (precedence)
      (4L, "zork blem fronk"))                           // unk
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.TextQueries.langPred.as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(0L -> "de", 1L -> "fr", 2L -> "zh", 3L -> "en", 4L -> "unk"),
      preds.toString)
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

  // ---- t_dsir_weights ------------------------------------------------

  private def dsir(docs: Seq[(Long, String, String)]): Map[Long, (Long, Long, Boolean)] =
    Round17Queries.dsirWeights(docs.toDF("doc_id", "source", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("t_dsir_weights: target-like raw docs weigh positive, target-unlike negative") {
    val out = dsir(Seq(
      (0L, "src0", "zork blem zork blem"),  // the target domain
      (10L, "src1", "zork blem zork blem"), // shares every bigram → target-like
      (11L, "src1", "aaa bbb ccc")))        // shares none → raw-like
    assert(out.keySet === Set(10L, 11L), out.toString) // src0 never scored
    val (g10, u10, sel10) = out(10L)
    val (g11, u11, sel11) = out(11L)
    assert(g10 === 3L && g11 === 2L, out.toString)
    assert(u10 > 0L && sel10, s"target-like doc must select: $out")
    assert(u11 < 0L && !sel11, s"target-unlike doc must not select: $out")
  }

  test("t_dsir_weights: docs with <2 tokens carry zero evidence and never select") {
    val out = dsir(Seq(
      (0L, "src0", "zork blem"),
      (10L, "src1", "solo"),
      (11L, "src1", "")))
    assert(out(10L) === ((0L, 0L, false)), out.toString)
    assert(out(11L) === ((0L, 0L, false)), out.toString)
  }

  test("t_dsir_weights: weight is additive in evidence — more shared bigrams, higher units") {
    val out = dsir(Seq(
      (0L, "src0", "zork blem fronk glip vemp"),
      (10L, "src1", "zork blem fronk glip vemp"), // 4 shared bigrams
      (11L, "src1", "zork blem quon drel smip"))) // 1 shared bigram
    assert(out(10L)._2 > out(11L)._2, out.toString)
  }

  // ---- t_bm25_topk ---------------------------------------------------

  private def bm25(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    Round17Queries.bm25TopK(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("t_bm25_topk: only matching docs rank; term coverage beats tf saturation") {
    val out = bm25(Seq(
      (1L, "vector join stream pad pad"),     // 3 query terms
      (2L, "vector pad pad pad pad"),         // 1 term, tf 1
      (3L, "pad pad pad pad pad"),            // no terms → absent
      (4L, "vector vector vector vector vector"))) // 1 term, tf 5 (saturated)
    assert(out.map(_._1).toSet === Set(1L, 2L, 4L), out.toString)
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._2 === 3L && byDoc(2L)._2 === 1L && byDoc(4L)._2 === 1L)
    assert(out.head._1 === 1L, s"3-term doc must rank first: $out")
    // saturation: tf 5 beats tf 1 but by less than 5×
    assert(byDoc(4L)._3 > byDoc(2L)._3, out.toString)
    assert(byDoc(4L)._3 < 5L * byDoc(2L)._3, out.toString)
  }

  test("t_bm25_topk: same tf, longer doc scores lower (length normalization)") {
    val out = bm25(Seq(
      (1L, "vector pad pad pad pad"),
      (2L, "vector pad pad pad pad pad pad pad pad pad")))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    assert(byDoc(1L) > byDoc(2L), out.toString)
  }

  test("t_bm25_topk: result is capped at 10 with deterministic doc_id tie-break") {
    val docs = (1L to 12L).map(i => (i, "vector pad pad")) :+ (99L, "pad")
    val out = bm25(docs)
    assert(out.size === 10, out.toString)
    // identical scores → doc_id ascending decides
    assert(out.map(_._1) === (1L to 10L), out.toString)
  }
}
