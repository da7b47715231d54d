package graft

import graft.operators.TextQueries
import org.apache.spark.sql.functions.col

/** Planted-fixture semantics for the round-7 text hygiene operators —
  * independent of the synthetic corpus the oracles run over.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  graft.plans.GraftFunctions.register(spark)

  test("R20: decontaminate flags exactly the docs sharing an eval n-gram") {
    val docsDf = Seq(
      (0L, "eval", "a b c d e f"),            // eval doc: 5-grams "a b c d e", "b c d e f"
      (1L, "train", "x b c d e f y"),         // carries eval 5-gram "b c d e f"
      (2L, "train", "p q r s t u v"),         // clean
      (3L, "train", "a b c d x e f"),         // shares words but NO verbatim 5-gram
      (4L, "train", "q a b c d e f w")        // carries BOTH eval 5-grams
    ).toDF("doc_id", "source", "text")
    val got = TextQueries.decontaminate(docsDf, evalSource = "eval")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 0L, false), (3L, 0L, false), (4L, 2L, true)))
  }

  test("R20: repetition gate — looping text trips it, diverse text does not") {
    val docsDf = Seq(
      (0L, "x y x y x y x y"),     // 7 2-grams, 2 distinct → dup 0.7143; top token 4/8
      (1L, "a b c d e f g h"),     // all distinct → dup 0, top 1/8
      (2L, "z z z z z z z z"),     // total repetition: dup 1-1/7, top 1.0
      (3L, "w")                    // single token: no 2-grams → dup 0, top 1.0 (dominance!)
    ).toDF("doc_id", "text")
    val got = TextQueries.repetition(docsDf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(got(0) === ((0L, 0.7143, 0.5, true)))
    assert(got(1) === ((1L, 0.0, 0.125, false)))
    assert(got(2) === ((2L, 0.8571, 1.0, true)))
    // a one-token doc has no repeated 2-grams but 100% token dominance —
    // the dominance dial is what catches degenerate stubs
    assert(got(3) === ((3L, 0.0, 1.0, true)))
  }

  test("R20: perplexity proxy scores out-of-distribution docs higher, integer-exact") {
    // corpus: "a" dominates (p=12/16), "b" common (3/16), "z" rare (1/16)
    val docsDf = Seq(
      (0L, "a a a a a a a a"),   // all high-probability tokens
      (1L, "a a a b b b z a")    // carries the rare token + mid tokens
    ).toDF("doc_id", "text")
    val got = TextQueries.perplexityProxy(docsDf, unusualUnits = 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    def u(p: Double): Long = math.floor(-math.log(p) * 10000 + 0.5).toLong
    val doc0 = 8 * u(12.0 / 16)
    val doc1 = 4 * u(12.0 / 16) + 3 * u(3.0 / 16) + u(1.0 / 16)
    assert(got(0) === ((0L, 8L, doc0, doc0 > 8L * 10000)))
    assert(got(1) === ((1L, 8L, doc1, doc1 > 8L * 10000)))
    // same token count, strictly higher nll for the out-of-distribution doc
    assert(doc1 > doc0)
    assert(!got(0)._4 && got(1)._4, got.mkString(","))
  }

  test("R20: char entropy — single-char flood scores 0, diverse text higher, integer-exact") {
    val docsDf = Seq(
      (0L, "aaaaaaaa"),   // one symbol: H = 0 exactly
      (1L, "abababab"),   // two symbols, uniform: H = ln 2
      (2L, "abcdefgh")    // eight symbols, uniform: H = ln 8
    ).toDF("doc_id", "text")
    val got = TextQueries.charEntropy(docsDf, lowUnits = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    def u(c: Long): Long = math.floor(c * math.log(c.toDouble) * 10000 + 0.5).toLong
    def h(n: Long, s: Long): Long =
      math.floor((math.log(n.toDouble) - s.toDouble / (n * 10000.0)) * 10000 + 0.5).toLong
    // hand-replay of the integer-unit pipeline, term by term
    assert(got(0) === ((0L, 8L, 1L, u(8), h(8, u(8)), true)))
    assert(got(0)._5 === 0L, "single-symbol doc must have exactly zero entropy")
    assert(got(1) === ((1L, 8L, 2L, 2 * u(4), h(8, 2 * u(4)), false)))
    assert(got(2) === ((2L, 8L, 8L, 0L, h(8, 0), false)))
    // ln 2 ≈ 0.6931, ln 8 ≈ 2.0794 in 1e-4 units
    assert(got(1)._5 === 6931L)
    assert(got(2)._5 === 20794L)
  }
}
