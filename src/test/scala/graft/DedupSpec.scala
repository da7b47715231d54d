package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docANear = "the quick brown fox jumps over the lazy dog again and again tonight" // 1 word differs
  private val docB = "completely different content about spark catalyst optimizer internals rules"

  test("R18: shingles are distinct n-grams; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
    val sh = df.select(shingles("text", 3).as("s")).collect()
    assert(sh(0).getSeq[String](0).toSet === Set("a b c", "b c d"))
    assert(sh(1).getSeq[String](0).isEmpty)
  }

  test("R18: jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("x", "y")))
      .toDF("s1", "s2", "s3")
    val r = df.select(
      jaccard($"s1", $"s2").as("same"),
      jaccard($"s1", $"s3").as("disjoint")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("R18: minhash+LSH flags planted near-dup pair but not unrelated docs") {
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((0L, docA), (1L, docANear), (2L, docB)).toDF("doc_id", "text")
    val base = df.select(col("doc_id"), shingles("text", 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", expr("graft_minhash(sh)"))
    val banded = base.select(col("doc_id"), col("sh"),
        explode(minhashBands("sig", 8, 4)).as("b"))
      .select(col("doc_id"), col("sh"), col("b.band"), col("b.h"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        jaccard(col("a.sh"), col("b.sh")).as("j"))
      .dropDuplicates("da", "db")
      .filter(col("j") >= 0.5)
      .collect()
    assert(cand.length === 1)
    assert((cand(0).getLong(0), cand(0).getLong(1)) === (0L, 1L))
  }

  test("R18: simhash of near-identical docs is closer than unrelated docs") {
    val df = Seq((0L, docA), (1L, docANear), (2L, docB)).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), simhash("split(text, ' ')").as("h"))
      .orderBy("doc_id").select("h").as[Long].collect()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0), sh(1)) < hamming(sh(0), sh(2)))
    assert(hamming(sh(0), sh(1)) <= 16) // near-dups share most bits
  }

  test("R17: streaming-style exact dedup keeps first occurrence") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val kept = df.groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("R18: MinHashUnionAgg signature equals the signature of the shingle union") {
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
      .select(col("doc_id"), shingles("text", 3).as("sh"))
      .withColumn("sig", expr("graft_minhash(sh)"))
    val grouped = df.agg(expr("graft_minhash_union(sig)").as("u"))
      .select("u").as[Seq[Long]].head()
    val combined = Seq((docA, docB)).toDF("ta", "tb")
      .select(expr("graft_minhash(array_union(graft_shingles(ta, 3), graft_shingles(tb, 3)))").as("c"))
      .as[Seq[Long]].head()
    assert(grouped === combined) // min over union == elementwise min of minima
  }

  test("R18: d_minhash_lsh achieves exact recall on the sf0.001 planted near-dups") {
    // Ground truth (computed by exhaustive 3-shingle Jaccard over all 125k
    // pairs): exactly 28 pairs at j >= 0.5, all at j ~ 0.89-0.99. The
    // 8x4 banding collides such pairs with probability ~1, so the pipeline
    // must find every one of them and nothing else.
    val got = SparkEntry.queries("d_minhash_lsh")(spark, "/root/testdata/sf0.001")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.size === 28)
    assert(Set((0L, 50L), (8L, 360L), (144L, 161L), (474L, 498L)).subsetOf(got))
  }

  test("R18: mega-bucket cap bounds a planted degenerate bucket; small buckets unchanged") {
    import graft.operators.DedupQueries
    // a 200-member boilerplate bucket + a healthy 10-member bucket
    val banded = ((0 until 200).map(i => (0, 7L, i.toLong)) ++
      (0 until 10).map(i => (1, 9L, (1000 + i).toLong)))
      .toDF("band", "h", "doc_id")
    val pairs = DedupQueries.bucketedCandidatePairs(banded)
    val mega = pairs.filter($"doc_a" < 1000).count()
    val small = pairs.filter($"doc_a" >= 1000).count()
    // degenerate bucket capped at C(64,2), nowhere near C(200,2) = 19900
    assert(mega === 64L * 63 / 2, s"mega bucket produced $mega pairs")
    // below the cap: exact uncapped pair set
    assert(small === 10L * 9 / 2)
    // determinism: the kept subset is the sorted prefix, not collect_list order
    val kept = pairs.filter($"doc_a" < 1000).agg(max($"doc_b")).as[Long].head()
    assert(kept === 63L)
    // the cut is not silent: the observed metrics report the 200-64 = 136
    // members the cap dropped and the raw size of the offending bucket
    // (collect() runs pairs' own QueryExecution, where the metrics land)
    pairs.collect()
    val m = pairs.queryExecution.observedMetrics("minhash_bucket_overflow")
    assert(m.getAs[Long]("members_cut") === 136L, m.toString)
    assert(m.getAs[Int]("max_bucket") === 200, m.toString)
  }

  test("R18: bucket-cap overflow observations read ZERO on the healthy corpus") {
    // healthy sf0.001: no bucket anywhere near either cap, so both
    // observation counters must be exactly 0 — any nonzero here means the
    // caps are silently eating recall on ordinary data
    val lsh = SparkEntry.queries("d_minhash_lsh")(spark, "/root/testdata/sf0.001")
    lsh.collect()
    val ml = lsh.queryExecution.observedMetrics("minhash_bucket_overflow")
    assert(ml.getAs[Long]("members_cut") === 0L, ml.toString)
    val sim = SparkEntry.queries("d_simhash_pairs")(spark, "/root/testdata/sf0.001")
    sim.collect()
    val ms = sim.queryExecution.observedMetrics("simhash_bucket_overflow")
    assert(ms.getAs[Long]("members_cut") === 0L, ms.toString)
    assert(ms.getAs[Int]("max_bucket") <= 512, ms.toString)
  }

  test("R17/R18: d_span_dedup flags a verbatim 8-token span shared across docs, nothing else") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d_span_dedup")(spark, d).collect()
    assert(out.length === 500)
    // the planted near-dup docs share long verbatim runs, so duplicated
    // spans must exist — and docs shorter than 8 tokens must report 0/0
    val dupTotal = out.map(_.getLong(2)).sum
    assert(dupTotal > 0, "planted near-dups must share at least one 8-token span")
    out.foreach { r =>
      val (n, dup, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dup <= n, s"doc ${r.getLong(0)}: $dup dup spans of $n")
      assert(if (n == 0) frac == 0.0 else math.abs(frac - math.floor(dup.toDouble / n * 10000 + 0.5) / 10000) < 1e-12)
    }
  }

  test("R18: adaptive simhash τ hits its documented boundary values") {
    import graft.operators.DedupQueries.simhashTau
    import spark.implicits._
    // τ = min(15, 7 + ⌈24/√min_tokens⌉) at the three documented token
    // counts — the recall dial the d_simhash_pairs comments promise; a
    // formula drift (constant tweak, ceil→floor, missing min) breaks here
    // with the offending count named, not as a silent recall change
    val got = Seq(10L, 25L, 100L, 1L, 10000L).toDF("n")
      .select(col("n"), simhashTau(col("n"), col("n")).as("tau"))
      .as[(Long, Long)].collect().toMap
    assert(got(10L) === 15L, s"n=10: ${got(10L)}")
    assert(got(25L) === 12L, s"n=25: ${got(25L)}")
    assert(got(100L) === 10L, s"n=100: ${got(100L)}")
    assert(got(1L) === 15L, "single-token doc must clamp at the 15 ceiling")
    assert(got(10000L) === 8L, "long docs converge to the tight 8-bit radius")
    // and the pair form takes the MORE permissive side (min token count)
    val pair = Seq((10L, 10000L)).toDF("na", "nb")
      .select(simhashTau(col("na"), col("nb"))).as[Long].head()
    assert(pair === 15L, s"pair τ must follow the shorter doc: $pair")
  }

  test("R17: prefix dedup groups docs on the first k tokens, keep-lowest wins") {
    import graft.operators.DedupQueries.prefixDedup
    val docsDf = Seq(
      (7L, "the quick fox ran far"),       // group "the quick fox" — member
      (2L, "the quick fox sat down"),      // group "the quick fox" — keeper
      (5L, "the quick fox"),               // exactly 3 tokens — same group
      (9L, "a different opening here"),    // unique prefix — absent
      (4L, "the quick dog sat down")       // differs at token 3 — absent
    ).toDF("doc_id", "text")
    val got = prefixDedup(docsDf, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq((2L, 3L, true), (5L, 3L, false), (7L, 3L, false)))
  }

  test("R17/R18: d_corpus_build_v2 survivors are a subset of d_corpus_build's") {
    // Round7Queries documents v2 as strictly-additive gating over v1
    // (repetition + decontamination on top of v1's quality gate), so every
    // v2 survivor must also survive v1. All per-doc gates are functions of
    // the text alone, so identical-text twins gate identically and exact
    // dedup keeps the same min doc_id in both — this pins the claimed
    // regression-pair invariant instead of trusting the comment.
    // collected separately: one combined plan would instantiate the LSH
    // subtree's observe() metric twice and fail DUPLICATED_METRICS_NAME
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    val v1 = SparkEntry.queries("d_corpus_build")(spark, d)
      .select("doc_id").as[Long].collect().toSet
    val v2 = SparkEntry.queries("d_corpus_build_v2")(spark, d)
      .select("doc_id").as[Long].collect().toSet
    val extras = v2 -- v1
    assert(extras.isEmpty,
      s"v2 kept ${extras.size} docs v1 dropped: ${extras.take(10).mkString(",")}")
    // and the gating is real: v2 must drop at least one v1 survivor
    assert((v1 -- v2).nonEmpty, "v2 == v1 — extra gates did nothing")
  }
}
