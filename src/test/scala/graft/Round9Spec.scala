package graft

import graft.operators.Round9Queries
import org.apache.spark.sql.functions._

/** Round-9 second-session operators: runtime Bloom prefilter,
  * content-defined-chunking dedup, BPE merge-pair mining.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ---- runtime Bloom filter pair -------------------------------------

  test("bloom: no false negatives — every built key probes true") {
    graft.plans.GraftFunctions.register(spark)
    spark.range(1, 501).toDF("k").createOrReplaceTempView("g_bloom_keys")
    val misses = spark.sql(
      """SELECT count(*) AS miss FROM g_bloom_keys
         WHERE NOT graft_bloom_contains(
           (SELECT graft_bloom_agg(xxhash64(k), 4096, 262144) FROM g_bloom_keys),
           xxhash64(k))""").head().getLong(0)
    assert(misses === 0L)
  }

  test("bloom: tight sizing rejects the planted non-members") {
    // deterministic for this fixed key set + Spark's fixed bloom hash seed:
    // at 500 items in 256 Kibit the fpp is ~1e-11, so these specific
    // probes sit far below any plausible false-positive draw
    graft.plans.GraftFunctions.register(spark)
    spark.range(1, 501).toDF("k").createOrReplaceTempView("g_bloom_keys")
    val hits = spark.sql(
      """SELECT count(*) AS hit
         FROM (SELECT id + 1000000 AS k FROM range(0, 1000))
         WHERE graft_bloom_contains(
           (SELECT graft_bloom_agg(xxhash64(k), 4096, 262144) FROM g_bloom_keys),
           xxhash64(k))""").head().getLong(0)
    assert(hits === 0L)
  }

  test("q_bloom_prefilter: bloom is a prefilter, never a semantics change") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_bloom_prefilter")(spark, d).collect()
    val want = Tables.lineitem(spark, d).as("l")
      .join(Tables.part(spark, d).filter(col("p_brand") === "Brand#4"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(count(lit(1)).cast("long").as("n_ship"))
      .orderBy("p_partkey")
      .collect()
    assert(got.length === want.length && got.length > 0)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      want.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("t_decontaminate_bloom ≡ broadcast decontaminate on a planted fixture") {
    // one training doc shares a verbatim 5-gram with the eval source, one
    // does not; the bloom twin must reproduce the broadcast core exactly
    val eva = "the held out benchmark question about spark shuffles here"
    val docs = Seq(
      (0L, eva, "src0"),
      (1L, s"training text copies the held out benchmark question about spark parts", "src1"),
      (2L, "completely clean training document with no overlap at all whatsoever", "src1")
    ).toDF("doc_id", "text", "source")
    val bloom = operators.Round9Queries.decontaminateBloom(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val base = graft.operators.TextQueries.decontaminate(docs, evalSource = "src0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(bloom === base)
    assert(bloom.find(_._1 == 1L).get._3 === true)
    assert(bloom.find(_._1 == 2L).get._3 === false)
  }

  test("t_decontaminate_bloom sf0.001 ≡ t_decontaminate output") {
    val d = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("t_decontaminate_bloom")(spark, d).collect()
    val b = SparkEntry.queries("t_decontaminate")(spark, d).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  // ---- content-defined chunking --------------------------------------

  private val sharedRun = (0 until 100).map(i => s"tok${i * 7 % 31}x$i").mkString(" ")

  test("d_cdc_chunks: shifted copies re-synchronize to shared chunks") {
    // the CDC property fixed-offset shingling lacks at chunk granularity:
    // the same 100-token run behind DIFFERENT-length prefixes still yields
    // identical interior chunks, because boundaries derive from content
    val docs = Seq(
      (0L, s"alpha beta $sharedRun"),
      (1L, s"one two three four five six seven $sharedRun"),
      (2L, "entirely unrelated content about catalyst plans and shuffles")
    ).toDF("doc_id", "text")
    val r = Round9Queries.cdcChunkStats(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L)._2 >= 1, s"doc 0 shares no chunk: $r")
    assert(r(1L)._2 >= 1, s"doc 1 shares no chunk: $r")
    assert(r(2L)._2 === 0, s"unrelated doc flagged: $r")
  }

  test("d_cdc_chunks: identical docs share every chunk; short docs chunk whole") {
    val docs = Seq(
      (0L, sharedRun), (1L, sharedRun),
      (2L, "a b"), (3L, "")
    ).toDF("doc_id", "text")
    val r = Round9Queries.cdcChunkStats(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .sortBy(_._1)
    assert(r(0)._4 === 1.0 && r(1)._4 === 1.0)
    assert(r(0)._2 === r(1)._2 && r(0)._2 > 1)
    // n >= 1 chunks always: a short doc is one whole-text chunk, and the
    // empty string still md5s to one chunk (no division by zero anywhere)
    assert(r(2)._2 === 1L && r(2)._3 === 0L)
    assert(r(3)._2 === 1L)
  }

  test("d_cdc_chunks: chunks tile the token stream (boundary arithmetic)") {
    // independent replay of the cut rule for one doc: reconstruct chunks
    // by hand and compare the count the operator reports
    val text = sharedRun
    val toks = text.split(" ")
    def hex(s: String): String = {
      val m = java.security.MessageDigest.getInstance("MD5")
      m.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val cuts = (4 until toks.length).filter { j =>
      val win = toks.slice(j - 4, j).mkString(" ")
      val last = hex(win).last
      last == '0' || last == '8'
    } :+ toks.length
    val chunks = cuts.scanLeft(0)((_, c) => c).sliding(2).map {
      case Seq(a, b) => toks.slice(a, b).mkString(" ")
    }.toSeq
    val expected = chunks.distinct.size.toLong
    val got = Round9Queries.cdcChunkStats(Seq((0L, text)).toDF("doc_id", "text"))
      .head().getLong(1)
    assert(got === expected, s"cuts=$cuts")
  }

  test("every query self-registers: graft_* resolve in a fresh session") {
    // newSession() shares the SparkContext but gets a FRESH function
    // registry — exactly the driver/Bench cold-start condition where a
    // query relying on a sibling's register call breaks. A sample of
    // graft_*-using queries from each family must run standalone.
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("d_containment", "d_span_dedup", "d_minhash_lsh",
                     "v_mmr_rerank", "t_decontaminate_bloom", "v_ivfpq_rerank")) {
      val fresh = spark.newSession()
      assert(SparkEntry.queries(name)(fresh, d).count() >= 0, name)
    }
  }

  // ---- containment (asymmetric) near-dup -----------------------------

  test("d_containment: a doc quoted whole scores 1.0 where Jaccard misses it") {
    val host = (0 until 30).map(i => s"h$i").mkString(" ")      // 30 tokens
    val quoted = (10 until 18).map(i => s"h$i").mkString(" ")   // 8-token slice
    val docs = Seq(
      (0L, host),
      (1L, quoted),
      (2L, "totally unrelated text about catalyst exchanges and heaps")
    ).toDF("doc_id", "text")
    val r = operators.Round9Queries.containmentStats(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // quoted doc: all 6 of its 3-grams appear in the host → containment 1.0
    assert(r(1L)._3 === 1.0, s"got $r")
    assert(r(1L)._2 === 6L)
    // host: only the 6 shared grams of its 28 → well under 1
    assert(r(0L)._3 < 0.25 && r(0L)._2 === 6L)
    assert(r(2L)._3 === 0.0)
    // and the symmetric Jaccard indeed misses the pair
    val j = graft.functions.TextFunctions.jaccard(
      split(lit(host), " "), split(lit(quoted), " "))
    val jv = docs.limit(1).select(j.as("j")).head().getDouble(0)
    assert(jv < 0.5, s"jaccard $jv should be below the near-dup threshold")
  }

  test("d_containment: posting cap trims deterministically (sorted prefix)") {
    // 70 docs share one exact 3-gram; the cap-64 trim keeps the 64 lowest
    // doc_ids, so docs 64..69 see no partner from that gram
    val docs = (0L until 70L).map(i => (i, s"shared tri gram tail$i"))
      .toDF("doc_id", "text")
    val r = operators.Round9Queries.containmentStats(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert((0L until 64L).forall(r(_) === 1L), "capped members lost their partner")
    assert((64L until 70L).forall(r(_) === 0L), "trim failed to drop the tail")
  }

  // ---- IVF-PQ serve-with-rerank --------------------------------------

  test("v_ivfpq_rerank sf0.001: 10 exact-ranked rows drawn from the ADC shortlist") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("v_ivfpq_rerank")(spark, d).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).distinct.length === 10)
    // re-rank output must be ordered by the exact distance column
    val d2us = rows.map(_.getLong(2)).toSeq
    assert(d2us === d2us.sorted, s"not exact-ranked: $d2us")
    // every returned row is a member of the ADC top-50 shortlist
    val short50 = SparkEntry.queries("v_pq_adc")(spark, d)
      .collect().map(_.getLong(0)).toSet // top-10 ⊆ top-50 sanity anchor
    assert(rows.map(_.getLong(0)).count(short50.contains) >= 1)
  }

  // ---- MMR diversified rerank ----------------------------------------

  test("v_mmr_rerank: diversification outranks a near-duplicate") {
    // q = (e1+e2)/√2; a1 = e1, a2 ≈ e1 (near-dup), b = e2. All three tie
    // on relevance (7071 units); pure top-k would emit 1,2,3 by id — MMR
    // must pick b over the a1-duplicate at step 2
    def vec(m: Map[Int, Float]): Seq[Float] =
      (0 until 64).map(i => m.getOrElse(i, 0f))
    val inv = (1.0 / math.sqrt(2)).toFloat
    val docs = Seq(
      (0L, vec(Map(0 -> inv, 1 -> inv))),
      (1L, vec(Map(0 -> 1f))),
      (2L, vec(Map(0 -> 1f, 2 -> 0.01f))),
      (3L, vec(Map(1 -> 1f)))
    ).toDF("vec_id", "embedding")
    val r = operators.Round9Queries.mmrRerank(spark, docs, k = 3)
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r.map(_._2) === Seq(1L, 3L, 2L), s"got $r")
  }

  test("v_mmr_rerank sf0.001: k distinct picks; step 1 is the exact top-1") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("v_mmr_rerank")(spark, d).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(1)).distinct.length === 10)
    val top1 = SparkEntry.queries("v_knn_probe")(spark, d)
      .head().getLong(0)
    assert(rows.find(_.getInt(0) === 1).get.getLong(1) === top1)
    // scores are non-increasing step over step is NOT an MMR invariant,
    // but every score must be ≤ 7×10000 (cosine ceiling) and the first
    // equals 7×rel of the top pick (ms = 0 at step 1)
    assert(rows.forall(_.getLong(2) <= 70000L))
  }

  test("v_mmr_rerank: fold matches an independent Scala greedy on random vectors") {
    // deterministic seeded corpus; the reference implementation repeats
    // the integer-unit arithmetic in plain Scala (same sequential dot,
    // same 4-dp floor, same tie-breaks) — any drift in the SQL fold's
    // selection logic or ms updates shows up as a different pick order
    val rnd = new scala.util.Random(20260813L)
    val vecs = (0L until 20L).map(i =>
      i -> Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)).toMap
    val docs = vecs.toSeq.sortBy(_._1).map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = operators.Round9Queries.mmrRerank(spark, docs, k = 5)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val dv = vecs.map { case (i, v) => i -> v.map(_.toDouble) }
    val q = dv(0L)
    val qn = math.sqrt(dot(q, q))
    def u(c: Double): Long = math.floor(c * 10000 + 0.5).toLong
    val cands = scala.collection.mutable.Map(
      dv.toSeq.filter(_._1 != 0L).map { case (i, v) =>
        val nrm = math.sqrt(dot(v, v))
        i -> ((u(dot(v, q) / (nrm * qn)), nrm, v, 0L))
      }: _*)
    val want = (1 to 5).map { t =>
      val (id, (rel, nrm, v, ms)) = cands.toSeq.minBy {
        case (i, (r, _, _, m)) => (-(7 * r - 3 * m), i)
      }
      cands.remove(id)
      for ((ci, (cr, cn, cv, cm)) <- cands)
        cands(ci) = (cr, cn, cv, math.max(cm, u(dot(cv, v) / (cn * nrm))))
      (t, id, 7 * rel - 3 * ms)
    }
    assert(got === want)
  }

  test("d_cdc_chunks: tiling arithmetic holds over random token streams") {
    val rnd = new scala.util.Random(813L)
    val texts = (0 until 10).map { _ =>
      (0 until (5 + rnd.nextInt(120))).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    }
    def hex(s: String): String = {
      val m = java.security.MessageDigest.getInstance("MD5")
      m.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def chunksOf(text: String): Seq[String] = {
      val toks = text.split(" ")
      val cuts = (4 until toks.length).filter { j =>
        val last = hex(toks.slice(j - 4, j).mkString(" ")).last
        last == '0' || last == '8'
      } :+ toks.length
      cuts.scanLeft(0)((_, c) => c).sliding(2).map {
        case Seq(a, b) => toks.slice(a, b).mkString(" ")
      }.toSeq
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = operators.Round9Queries.cdcChunkStats(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val wantCounts = texts.map(t => chunksOf(t).distinct.size.toLong)
    assert(got.map(_._2).toSeq === wantCounts)
    // shared counts from the same reference chunking
    val sets = texts.map(t => chunksOf(t).distinct.toSet)
    val wantDup = sets.zipWithIndex.map { case (s, i) =>
      s.count(c => sets.zipWithIndex.exists { case (o, j) => j != i && o(c) }).toLong
    }
    assert(got.map(_._3).toSeq === wantDup)
  }

  // ---- BPE merge-pair mining -----------------------------------------

  test("t_bpe_pairs: counts weight by word frequency; ties break by pair") {
    val docs = Seq("low low lower").toDF("text")
    val rows = Round9Queries.bpePairs(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // vocab: low×2, lower×1 ⇒ lo:3 ow:3 er:1 we:1; ties alphabetical
    assert(rows === Seq(("lo", 3L), ("ow", 3L), ("er", 1L), ("we", 1L)))
  }

  test("t_bpe_pairs: total pair mass equals sum over tokens of len-1") {
    val docs = Seq("aa bbb c", "aa dd").toDF("text")
    val total = Round9Queries.bpePairs(docs, topK = 1000)
      .agg(sum(col("cnt"))).head().getLong(0)
    // aa(×2):1 each, bbb:2, c:0, dd:1 ⇒ 2+2+0+1 = 5
    assert(total === 5L)
  }
}
