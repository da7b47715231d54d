package graft

import graft.operators.{Envelope, Replay}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based semantics checks (SURVEY.md §5.3): enrichment round-trip
  * ∀ payloads, gap arithmetic ∀ ordinal sets, Jaccard metric laws. Uses
  * ScalaCheck generators with fixed seeds (the scalatest↔scalacheck bridge
  * artifact is not in the offline cache), evaluated through the actual
  * Spark expressions — not a reimplementation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private val keyGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val payloadGen: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(keyGen, Gen.chooseNum(-1000000L, 1000000L))).map(_.take(6))

  test("P4 ∀ payloads: enrichment preserves every key and adds ess_ordinal") {
    val cases = samples(Gen.zip(payloadGen, Gen.chooseNum(0L, 1L << 40)), 20)
    assert(cases.size === 20)
    cases.foreach { case (payload, ordinal) =>
      val json = payload.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      val wire = Seq((json, ordinal)).toDF("body", "ordinal")
        .select(Envelope.enrichJson($"body", $"ordinal", lit(99L)).as("w"))
        .as[String].head()
      payload.foreach { case (k, v) =>
        val got = Seq(wire).toDF("w")
          .select(get_json_object($"w", s"$$.$k")).as[String].head()
        assert(got === v.toString, s"key $k lost in $wire")
      }
      val o = Seq(wire).toDF("w")
        .select(get_json_object($"w", "$.ess_ordinal")).as[String].head()
      assert(o === ordinal.toString)
    }
  }

  test("R11 ∀ ordinal sets: sum of gaps + count == span") {
    val gen = Gen.containerOf[Set, Long](Gen.chooseNum(1L, 500L)).suchThat(_.size >= 2)
    samples(gen, 15).foreach { ords =>
      val df = ords.toSeq.toDF("ordinal")
      val gaps = Replay.gaps(df, $"ordinal")
        .agg(coalesce(sum($"__gap"), lit(0L))).as[Long].head()
      val span = ords.max - ords.min + 1
      assert(gaps + ords.size === span, s"gaps=$gaps n=${ords.size} span=$span for $ords")
    }
  }

  test("R18 ∀ token sets: Jaccard ∈ [0,1], symmetric, 1 iff equal sets") {
    val toksGen = Gen.nonEmptyContainerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e", "f"))
    samples(Gen.zip(toksGen, toksGen), 15).foreach { case (a, b) =>
      val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      val (jab, jba) = df.select(
        TextFunctions.jaccard($"a", $"b"),
        TextFunctions.jaccard($"b", $"a")).as[(Double, Double)].head()
      assert(jab === jba)
      assert(jab >= 0.0 && jab <= 1.0)
      assert((jab == 1.0) === (a == b))
    }
  }

  test("R17 ∀ random graphs: ConnectedComponents == driver union-find") {
    // the DuckDB oracle only covers chain-shaped edge sets; this covers
    // arbitrary topologies (stars, cycles, cross-links, multi-components)
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(edgeGen, 8).foreach { edges =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        parent.getOrElseUpdate(x, x)
        if (parent(x) != x) parent(x) = find(parent(x))
        parent(x)
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      // both execution paths must agree with the reference: the
      // single-task union-find endgame (default threshold) and the
      // distributed min-label loop (threshold 0 forces it)
      val gotLocal = graft.operators.ConnectedComponents
        .ofEdges(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLocal === expected, s"local path, edges=$edges")
      val gotDist = graft.operators.ConnectedComponents
        .ofEdges(edges.toDF("src", "dst"), localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist === expected, s"distributed path, edges=$edges")
    }
  }

  test("R20 ∀ texts: char entropy matches a driver-side replay and its bounds") {
    // entropy laws over arbitrary word-soup: 0 ≤ H ≤ ln(n) (uniform max),
    // H = 0 iff one distinct symbol, and the integer-unit pipeline equals
    // a driver-side replay term for term — the whole computation, not a
    // summary, ∀ inputs rather than the three planted docs
    val textGen = Gen.nonEmptyListOf(Gen.oneOf("aa", "b", "cde", "f g", "zz z"))
      .map(_.take(12).mkString(" "))
    samples(textGen, 15).zipWithIndex.foreach { case (text, i) =>
      val row = graft.operators.TextQueries
        .charEntropy(Seq((i.toLong, text)).toDF("doc_id", "text"), lowUnits = 0L)
        .collect().head
      val (n, k, s, h) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      val chars = text.toSeq.groupBy(identity).view.mapValues(_.size.toLong)
      val expS = chars.values.map(c =>
        math.floor(c * math.log(c.toDouble) * 10000 + 0.5).toLong).sum
      val expH = math.floor(
        (math.log(n.toDouble) - expS.toDouble / (n * 10000.0)) * 10000 + 0.5).toLong
      assert(n === text.length.toLong && k === chars.size.toLong)
      assert(s === expS, s"clogc units for '$text'")
      assert(h === expH, s"entropy units for '$text'")
      assert(h >= 0 && h <= math.ceil(math.log(n.toDouble) * 10000).toLong + 1)
      assert((h == 0L) === (k == 1L), s"H=0 iff single symbol: '$text'")
    }
  }

  test("R17 ∀ corpora: prefix-dedup groups partition the colliding docs, one keeper each") {
    // ∀ random corpora: every emitted group's size matches the true prefix
    // multiplicity, exactly one keeper per group (the min doc_id), and
    // docs with unique prefixes never appear
    val docGen = Gen.listOfN(10, Gen.listOfN(4,
      Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    samples(docGen, 10).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val byPrefix = docs.groupBy(_._2.split(" ").take(3).mkString(" "))
      val got = graft.operators.DedupQueries
        .prefixDedup(docs.toDF("doc_id", "text"), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val expected = byPrefix.values.filter(_.size > 1).flatMap { grp =>
        val keeper = grp.map(_._1).min
        grp.map { case (id, _) => (id, grp.size.toLong, id == keeper) }
      }.toSeq.sortBy(_._1)
      assert(got.toSeq === expected, s"texts=$texts")
    }
  }

  test("R19 ∀ code vectors: the ADC unpack (native + SQL twin) inverts the base-17 pack against any LUT") {
    // ∀ random 8-digit code vectors (digits 0..15) and random positive
    // LUTs: peeling the packed integer digit-by-digit and spending each
    // on its positional lookup must return exactly Σ lut[ss*16+code_ss]
    // — the pack/unpack pairing every stored-code serving path depends
    // on. The retired HOF fold is kept here as the parity reference for
    // the native graft_pq_adc that replaced it on the serving paths.
    graft.plans.GraftFunctions.register(spark)
    val adcSql =
      """aggregate(sequence(0, 7),
           named_struct('s', CAST(0 AS BIGINT), 'p', pq_code),
           (acc, j) -> named_struct(
             's', acc.s + element_at(lut, CAST(j * 16 + acc.p % 17 + 1 AS INT)),
             'p', acc.p DIV 17),
           acc -> acc.s)"""
    val codesGen = Gen.listOfN(8, Gen.chooseNum(0, 15))
    val lutGen = Gen.listOfN(128, Gen.chooseNum(0L, 1000000L))
    samples(Gen.zip(codesGen, lutGen), 25).foreach { case (codes, lut) =>
      val packed = codes.zipWithIndex.map { case (c, ss) =>
        c * BigInt(17).pow(ss) }.sum.toLong
      val expected = codes.zipWithIndex.map { case (c, ss) => lut(ss * 16 + c) }.sum
      val row = Seq((packed, lut)).toDF("pq_code", "lut")
        .selectExpr(adcSql, "graft_pq_adc(pq_code, lut)")
        .as[(Long, Long)].head()
      assert(row._1 === expected, s"SQL fold: codes=$codes packed=$packed")
      assert(row._2 === expected, s"native: codes=$codes packed=$packed")
    }
    // fail-safe: short LUT and negative code are null, never garbage
    val bad = Seq((-1L, (0 until 128).map(_.toLong)), (0L, Seq(1L, 2L)))
      .toDF("pq_code", "lut")
      .selectExpr("graft_pq_adc(pq_code, lut)").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("R6 ∀ event logs: cdcMergeApply == a literal per-user MERGE fold") {
    // The window-cut formulation (last-tombstone / first-live-insert) is an
    // algebraic shortcut; the ground truth is the sequential CDC fold a
    // MERGE engine runs. Generate random per-user op logs and replay both.
    val opGen = Gen.frequency(
      3 -> Gen.const("signup"), 2 -> Gen.const("error"),
      3 -> Gen.const("click"), 2 -> Gen.const("view"), 3 -> Gen.const("purchase"))
    val logGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(1L, 4L), opGen,
      Gen.chooseNum(0, 9999).map(_ / 100.0)))
    samples(logGen, 12).foreach { raw =>
      // unique, order-defining event ids
      val log = raw.zipWithIndex.map { case ((u, op, v), i) => (u, i + 1L, op, v) }
      // ground truth: sequential fold per user
      case class St(liveSince: Long, lastId: Long, nUpd: Long, units: Long)
      val truth = log.groupBy(_._1).flatMap { case (u, evs) =>
        var st: Option[St] = None
        evs.sortBy(_._2).foreach { case (_, id, op, v) =>
          op match {
            case "error" => st = None
            case "signup" => st = st match {
              case Some(s) => Some(s.copy(lastId = id)) // upsert on existing
              case None => Some(St(id, id, 0L, 0L))
            }
            case upd => st = st.map { s =>
              s.copy(lastId = id, nUpd = s.nUpd + 1,
                units = s.units + (if (upd == "purchase") math.floor(v * 10000).toLong else 0L))
            } // no-op when absent
          }
        }
        st.map(s => (u, s.liveSince, s.lastId, s.nUpd, s.units))
      }.toSet
      val got = graft.operators.WarehouseQueries.cdcMergeApply(
          log.toDF("user_id", "event_id", "event_type", "value"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === truth, s"log=$log")
    }
  }

  test("R20 \u2200 texts: PII scrub counts are non-negative, residual-free, idempotent") {
    import graft.operators.Round13Queries
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val pii = Gen.oneOf("a.b@example.com", "555-1234", "123456789", "x9@y.io",
      "user.name+tag@sub.domain.org")
    val textGen = Gen.nonEmptyListOf(Gen.frequency(4 -> word, 1 -> pii))
      .map(_.take(12).mkString(" "))
    val (ne, np, ni, t) = Round13Queries.piiStages(col("text"))
    def scrub(text: String): (Int, Int, Int, String) = {
      val r = Seq(text).toDF("text")
        .select(ne.as("a"), np.as("b"), ni.as("c"), t.as("t")).head()
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
    }
    samples(textGen, 20).foreach { text =>
      val (a, b, c, scrubbed) = scrub(text)
      assert(a >= 0 && b >= 0 && c >= 0)
      val (a2, b2, c2, again) = scrub(scrubbed)
      assert((a2, b2, c2) === ((0, 0, 0)),
        s"residual PII after scrubbing '$text' -> '$scrubbed'")
      assert(again === scrubbed, s"second scrub must be identity on '$scrubbed'")
    }
  }

  test("T6 \u2200 estimates: state-partition autosizing bounded, monotone, pow2 unless clamped") {
    import graft.streaming.StreamingAggs.stateJoinPartitions
    val gen = Gen.zip(Gen.chooseNum(0L, 10000000L), Gen.chooseNum(1, 4096))
    samples(gen, 40).foreach { case (est, cap) =>
      val p = stateJoinPartitions(est, cap)
      assert(p >= 1 && p <= cap, s"est=$est cap=$cap -> $p")
      assert(stateJoinPartitions(est + 1, cap) >= p,
        s"one more key must never shrink the count: est=$est cap=$cap")
      assert(p === cap || (p & (p - 1)) === 0,
        s"unclamped counts must be powers of two: est=$est cap=$cap -> $p")
    }
  }
}
