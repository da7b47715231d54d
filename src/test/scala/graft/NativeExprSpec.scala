package graft

import org.apache.spark.sql.functions._

/** Edge-case behavior of the native expressions (graft.plans). */
object NativeExprSpec {
  // top-level (companion) so typedLit can summon a TypeTag AND encoder
  // codegen can instantiate it without an outer instance; the
  // (cell, cv, cnrm) shape graft_pick_cell reads
  case class Cent(cell: Long, cv: Seq[Double], cnrm: Double)
}

class NativeExprSpec extends SparkSpec {
  import spark.implicits._
  import NativeExprSpec.Cent

  test("graft_shingles: unicode text, repeated grams, single token, empty string") {
    val df = Seq(
      "héllo wörld héllo wörld héllo", // unicode + repeats
      "solo",                          // fewer tokens than n
      ""                               // empty
    ).toDF("text")
    val out = df.select(expr("graft_shingles(text, 2)").as("sh")).collect()
    assert(out(0).getSeq[String](0).toSet ===
      Set("héllo wörld", "wörld héllo")) // distinct, order-insensitive
    assert(out(1).getSeq[String](0).isEmpty)
    assert(out(2).getSeq[String](0).isEmpty)
  }

  test("graft_minhash: empty shingle array yields NULL (not a shared sentinel); null in, null out") {
    // the old all-MaxValue sentinel gave every too-short doc an IDENTICAL
    // signature — estimated-Jaccard-1.0 near-dups for unfiltered callers;
    // null matches the HOF array_min-over-empty semantics
    val df = Seq(Some(Seq.empty[String]), None).toDF("sh")
    val rows = df.select(expr("graft_minhash(sh)").as("sig")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("graft_minhash: signature of a superset is element-wise <= the subset's") {
    val df = Seq((Seq("a", "b"), Seq("a", "b", "c", "d"))).toDF("s1", "s2")
    val r = df.select(
      expr("graft_minhash(s1)").as("m1"), expr("graft_minhash(s2)").as("m2")).head()
    val (m1, m2) = (r.getSeq[Long](0), r.getSeq[Long](1))
    assert(m1.zip(m2).forall { case (a, b) => b <= a })
  }

  test("graft_simhash: identical token arrays give identical hashes; empty gives 0") {
    val df = Seq(
      (Seq("x", "y", "z"), Seq("x", "y", "z")),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val rows = df.select(
      expr("graft_simhash(a)").as("ha"), expr("graft_simhash(b)").as("hb")).collect()
    assert(rows(0).getLong(0) === rows(0).getLong(1))
    assert(rows(1).getLong(0) === 0L) // no majority on any bit
  }

  test("graft_dot: empty arrays dot to 0; SQL registration works end-to-end") {
    val df = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    assert(df.selectExpr("graft_dot(a, b)").head().getDouble(0) === 0.0)
  }

  test("graft_dot: generated code is bit-identical to the HOF left-fold; mismatch is null") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      (i, Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    } :+ ((-1, Seq(1.0, 2.0), Seq(1.0))) // length mismatch row
    // repartition so the projection is NOT constant-folded into a
    // LocalTableScan — it must run inside a real codegen stage
    val df = rows.toDF("id", "a", "b").repartition(2)
    val got = df.select(col("id"),
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)").as("hof"))
      .collect()
    val (bad, good) = got.partition(_.getInt(0) == -1)
    assert(good.length === 50)
    good.foreach { r =>
      // bit-identical, not approximately equal: same summation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
    assert(bad.length === 1 && bad.head.isNullAt(1) && bad.head.isNullAt(2))
    // and the plan stays inside whole-stage codegen (no fallback marker) —
    // collect first so AQE materializes the final plan
    val df2 = df.select(expr("graft_dot(a, b)"))
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in plan strings;
    // a CodegenFallback expression would leave the Project unstarred
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")), plan)
  }

  test("graft_pq_encode equals the HOF fold on random vectors; stays in codegen; bad shapes null") {
    // the retired SQL formulation, kept here as the parity reference: per
    // subspace, argmin of floor(Σ(x-y)²·1e4+0.5) over the 16 struct
    // entries (strict < keeps the lowest code), winners packed base-17 —
    // graft_pq_encode must reproduce it BIT-identically (same double
    // left-fold order feeding the same floor) against the flat
    // [ss][code][dim] layout of the same codebook
    val d2u =
      """CAST(floor(aggregate(
           zip_with(slice(v, c.ss * 8 + 1, 8), c.sv, (x, y) -> (x - y) * (x - y)),
           CAST(0.0 AS DOUBLE), (a, b) -> a + b) * 10000 + 0.5) AS BIGINT)"""
    val hofSql =
      s"""aggregate(
            transform(sequence(0, 7), j ->
              aggregate(filter(cb, c -> c.ss = j),
                named_struct('d2u', CAST(9223372036854775807 AS BIGINT), 'code', -1),
                (acc, c) -> CASE WHEN $d2u < acc.d2u
                  THEN named_struct('d2u', $d2u, 'code', CAST(c.code AS INT))
                  ELSE acc END)),
            named_struct('pq_code', 0L, 'mse_units', 0L, 'p', 1L),
            (acc, s) -> named_struct(
              'pq_code', acc.pq_code + CAST(s.code AS BIGINT) * acc.p,
              'mse_units', acc.mse_units + s.d2u,
              'p', acc.p * 17L),
            acc -> array(acc.pq_code, acc.mse_units))"""
    val rnd = new scala.util.Random(23)
    val book = (0 until 16).map(_ => Seq.fill(64)(rnd.nextGaussian()))
    // flat [ss][code][dim] twin of the same codebook
    val cbFlat: Seq[Double] = (0 until 8).flatMap(ss =>
      (0 until 16).flatMap(code => book(code).slice(ss * 8, ss * 8 + 8)))
    val vecs = (0 until 50).map(i => (i, Seq.fill(64)(rnd.nextGaussian()))) ++
      book.take(3).zipWithIndex.map { case (v, i) => (100 + i, v) } // zero-error rows
    val df = vecs.toDF("id", "v").repartition(2)
      .withColumn("bookvecs", typedLit(book))
      // struct codebook in code-major order: filter(cb, c.ss = j) then
      // iterates codes ascending, the argmin tie order the HOF needs
      .withColumn("cb", expr(
        """flatten(transform(bookvecs, (bv, code) ->
             transform(sequence(0, 7), ss ->
               struct(CAST(code AS INT) AS code, ss AS ss,
                      slice(bv, ss * 8 + 1, 8) AS sv))))"""))
      .withColumn("cbflat", typedLit(cbFlat))
    val got = df.select(col("id"),
      expr("graft_pq_encode(v, cbflat)").as("native"),
      expr(hofSql).as("hof")).collect()
    assert(got.length === 53)
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getInt(0)}")
    }
    // codebook members encode to themselves with zero error
    got.filter(_.getInt(0) >= 100).foreach { r =>
      assert(r.getSeq[Long](1)(1) === 0L, s"id=${r.getInt(0)} mse")
    }
    // wrong shapes are null, never garbage
    val bad = Seq((Seq(1.0, 2.0), cbFlat), (Seq.fill(64)(0.0), Seq(1.0)))
      .toDF("v", "cbflat")
      .select(expr("graft_pq_encode(v, cbflat)").as("r")).collect()
    assert(bad.forall(_.isNullAt(0)))
    // and the encode stays inside whole-stage codegen
    val df2 = df.select(expr("graft_pq_encode(v, cbflat)"))
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_pq_encode")), plan)
  }

  test("graft_pick_cell equals the HOF argmax fold; ties keep lowest cell; stays in codegen") {
    // the retired SQL formulation (SimilarityQueries.pickCellWithCosSql),
    // kept as the parity reference: candidates coalesce(4-dp cosine, -2),
    // strict > over the cell-ascending array keeps the lowest cell on ties
    val cos =
      """CASE WHEN nrm * s.cnrm > 0D
           THEN floor(graft_dot(v, s.cv) / (nrm * s.cnrm) * 10000.0 + 0.5) / 10000.0
         END"""
    val hof =
      s"""aggregate(cells,
            named_struct('best', CAST(-2.0 AS DOUBLE), 'cell', CAST(-1 AS BIGINT)),
            (acc, s) -> CASE WHEN coalesce($cos, -2D) > acc.best
              THEN named_struct('best', coalesce($cos, -2D), 'cell', s.cell)
              ELSE acc END,
            acc -> acc)"""
    val rnd = new scala.util.Random(31)
    val dup = Seq.fill(16)(rnd.nextGaussian()) // duplicated centroid → tie
    val centVecs: Seq[Seq[Double]] = Seq(
      dup,                          // cell 3
      Seq.fill(16)(0.0),            // cell 5: zero norm — can never win
      dup,                          // cell 8: identical to cell 3 — tie
      Seq.fill(16)(rnd.nextGaussian()),
      Seq.fill(16)(rnd.nextGaussian()))
    val centIds = Seq(3L, 5L, 8L, 20L, 40L)
    val vecs = ((0 until 40).map(i => (i, Seq.fill(16)(rnd.nextGaussian()))) ++
      Seq((100, dup),                // exact duplicate of the tied centroid
          (101, Seq.fill(16)(0.0))) // zero vector: every candidate -2
      ).map { case (i, v) => (i, v, math.sqrt(v.map(x => x * x).sum)) }
    // nrm and the centroid array are precomputed driver-side: in-plan HOF
    // folds are CodegenFallback expressions and would drag the WHOLE
    // project out of whole-stage codegen, confounding both the perf point
    // and the codegen assertion below
    val cents = centIds.zip(centVecs).map { case (id, cv) =>
      Cent(id, cv, math.sqrt(cv.map(x => x * x).sum)) }.sortBy(_.cell)
    val df = vecs.toDF("id", "v", "nrm").repartition(2)
      .withColumn("cells", typedLit(cents))
    val got = df.select(col("id"),
      expr("graft_pick_cell(v, nrm, cells)").as("native"),
      expr(hof).as("hof")).collect()
    assert(got.length === 42)
    got.foreach(r => assert(r.getStruct(1) === r.getStruct(2), s"id=${r.getInt(0)}"))
    // the duplicate-of-centroid row maxes at cosine 1.0 on BOTH tied
    // cells — the argmax must keep the lower cell id (3, not 8)
    val tied = got.find(_.getInt(0) === 100).get.getStruct(1)
    assert(tied.getDouble(0) === 1.0 && tied.getLong(1) === 3L)
    // the zero vector scores -2 everywhere: sentinel accumulator out
    val zero = got.find(_.getInt(0) === 101).get.getStruct(1)
    assert(zero.getDouble(0) === -2.0 && zero.getLong(1) === -1L)
    // null top-level input → null result (fail-safe), and an empty cell
    // array → the (-2, -1) sentinel like the fold
    val edge = Seq(1).toDF("x").select(
      expr("""graft_pick_cell(CAST(NULL AS ARRAY<DOUBLE>), 1.0D,
                array(named_struct('cell', 1L, 'cv', array(1.0D), 'cnrm', 1.0D)))""")
        .as("nullv"),
      expr("""graft_pick_cell(array(1.0D), 1.0D,
                CAST(array() AS ARRAY<STRUCT<cell: BIGINT, cv: ARRAY<DOUBLE>, cnrm: DOUBLE>>))""")
        .as("empty")).collect().head
    assert(edge.isNullAt(0))
    assert(edge.getStruct(1).getDouble(0) === -2.0 && edge.getStruct(1).getLong(1) === -1L)
    // and the argmax stays inside whole-stage codegen
    val df2 = df.select(expr("graft_pick_cell(v, nrm, cells)"))
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_pick_cell")), plan)
  }

  test("graft_jaccard equals the SQL array_intersect form on random distinct arrays") {
    import org.apache.spark.sql.functions._
    // random-ish distinct string arrays with overlap, plus the edge shapes:
    // both empty, one empty, disjoint, identical
    val rows = (0 until 200).map { i =>
      val a = (0 until (i % 17)).map(k => s"w${(i * 7 + k * 3) % 40}").distinct
      val b = (0 until (i % 13)).map(k => s"w${(i * 5 + k * 11) % 40}").distinct
      (a, b)
    } :+ ((Seq.empty[String], Seq.empty[String])) :+ ((Seq("x"), Seq.empty[String]))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val got = df.select(
      expr("graft_jaccard(a, b)").as("native"),
      expr("""CASE WHEN size(a) + size(b) - size(array_intersect(a, b)) > 0
                THEN CAST(size(array_intersect(a, b)) AS DOUBLE)
                     / (size(a) + size(b) - size(array_intersect(a, b)))
                ELSE 0.0 END""").as("sql"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    // the verify loop must stay inside whole-stage codegen (the `*(n)`
    // marker) — a CodegenFallback here costs a virtual call + boxing per
    // candidate pair on the near-dup verify path. repartition keeps
    // ConvertToLocalRelation from folding the projection away before it
    // ever reaches the physical planner.
    val df2 = df.repartition(2).select(expr("graft_jaccard(a, b)"))
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_jaccard")), plan)
  }

  test("graft_jaccard sorted-long form and graft_intersect_count match the string-set arithmetic") {
    import org.apache.spark.sql.functions._
    // the same fixtures as the string test, hashed+sorted: the sorted-long
    // merge must agree with the string-set jaccard, and the intersect
    // count with array_intersect — including dup values inside one array
    // (the intra-doc hash-collision shape the merge dedups inline)
    val rows = (0 until 200).map { i =>
      val a = (0 until (i % 17)).map(k => ((i * 7 + k * 3) % 40).toLong).distinct.sorted
      val b = (0 until (i % 13)).map(k => ((i * 5 + k * 11) % 40).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(3L), Seq.empty[Long])) :+
      ((Seq(1L, 1L, 2L, 5L, 5L), Seq(1L, 5L, 5L, 9L))) // dup-value arrays
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val got = df.select(
      expr("graft_jaccard(a, b)").as("native"),
      expr("graft_intersect_count(a, b)").as("icount"),
      expr("""CASE WHEN size(array_distinct(a)) + size(array_distinct(b))
                        - size(array_intersect(a, b)) > 0
                THEN CAST(size(array_intersect(a, b)) AS DOUBLE)
                     / (size(array_distinct(a)) + size(array_distinct(b))
                        - size(array_intersect(a, b)))
                ELSE 0.0 END""").as("sqlj"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("sqli"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.toString)
      assert(r.getLong(1) === r.getLong(3), r.toString)
    }
    // both long forms must stay inside whole-stage codegen too
    val df2 = df.repartition(2).select(
      expr("graft_jaccard(a, b)"), expr("graft_intersect_count(a, b)"))
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") &&
      l.contains("graft_intersect_count")), plan)
  }

  test("shingles/simhash/minhash stay inside whole-stage codegen (no fallback split)") {
    import org.apache.spark.sql.functions._
    // a CodegenFallback on any of these would split the stage and cost
    // every co-resident expression its fusion — the `*(n)` marker must
    // cover the projection computing all three
    val df = spark.createDataFrame(Seq(
        (1L, "a b c d e"), (2L, "x y z"), (3L, "")))
      .toDF("id", "text")
      .repartition(2)
      .selectExpr("id", "graft_shingles(text, 2) AS sh")
      .selectExpr("id", "graft_simhash(sh) AS sim", "graft_minhash(sh) AS mh")
    val rows = df.collect()
    assert(rows.length === 3)
    // empty text ⇒ empty shingles ⇒ null minhash (not a sentinel)
    assert(rows.find(_.getLong(0) == 3L).get.isNullAt(2))
    val plan = df.queryExecution.executedPlan.toString
    for (fn <- Seq("graft_shingles", "graft_simhash", "graft_minhash"))
      assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains(fn)),
        s"$fn not inside WholeStageCodegen:\n$plan")
  }

  test("graft_cms_est: probes count_min_sketch binaries — exact on planted counts") {
    import spark.implicits._
    // 3 distinct items with known multiplicities, far apart so a counter
    // collision (probability ~0 at width 20k) would be unmissable
    val items = Seq.fill(100)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val est = items.toDF("t")
      .agg(expr("count_min_sketch(t, 0.0001d, 0.99d, 42)").as("cms"))
      .crossJoin(Seq("alpha", "beta", "gamma", "absent").toDF("probe"))
      .selectExpr("probe", "graft_cms_est(cms, probe) AS est")
      .as[(String, Long)].collect().toMap
    // CMS guarantee is est >= true; at this width/vocab it is exact
    assert(est === Map("alpha" -> 100L, "beta" -> 7L, "gamma" -> 1L,
      "absent" -> 0L), est.toString)
  }

  // ---- code-review r17 hardening ----------------------------------------

  test("graft_jaccard: non-distinct string arrays use set semantics on both sides") {
    // the one-set form deduped only the hashed side while the denominator
    // used raw sizes — graft_jaccard(['x','x','y'], ['x','y']) returned
    // 0.667 for a true set Jaccard of 1.0
    val df = Seq((Seq("x", "x", "y"), Seq("x", "y"))).toDF("a", "b")
    val j = df.select(expr("graft_jaccard(a, b)")).as[Double].head()
    assert(j === 1.0, s"set Jaccard of equal sets must be 1.0, got $j")
  }

  test("graft_jaccard / graft_intersect_count: a null ELEMENT nulls the result") {
    // the sorted-long merge read a null slot as 0 — a phantom shared
    // element between any two null-carrying arrays
    val longs = Seq((Seq[Option[Long]](Some(5L), None), Seq[Option[Long]](Some(7L), None)))
      .toDF("a", "b")
    assert(longs.select(expr("graft_jaccard(a, b)")).collect().head.isNullAt(0))
    assert(longs.select(expr("graft_intersect_count(a, b)")).collect().head.isNullAt(0))
    val strs = Seq((Seq[Option[String]](Some("x"), None), Seq[Option[String]](Some("x"))))
      .toDF("a", "b")
    assert(strs.select(expr("graft_jaccard(a, b)")).collect().head.isNullAt(0))
    // and graft_minhash / graft_simhash apply the same fail-safe rule
    val one = Seq(Seq[Option[String]](Some("tok"), None)).toDF("sh")
    assert(one.select(expr("graft_minhash(sh)")).collect().head.isNullAt(0))
    assert(one.select(expr("graft_simhash(sh)")).collect().head.isNullAt(0))
  }

  test("graft_minhash_union: an all-NULL group yields NULL, not the MaxValue sentinel") {
    // two groups of only too-short docs used to both evaluate to
    // [MaxValue × k] and compare as estimated-Jaccard-1.0 overlap
    val df = Seq(("g1", ""), ("g1", ""), ("g2", "real tokens here now"))
      .toDF("grp", "text")
      .selectExpr("grp", "graft_minhash(graft_shingles(text, 2)) AS sig")
    val out = df.groupBy("grp")
      .agg(expr("graft_minhash_union(sig)").as("usig"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(out("g1"), "a group with only null signatures must union to NULL")
    assert(!out("g2"), "a real group still gets its union signature")
  }

  test("graft_minhash_union: deserialize rejects a width-mismatched buffer loudly (ADVICE r17)") {
    // the wire format is k signature slots + 1 non-empty flag; a buffer
    // from a k-mismatched caller (or a pre-flag build) must fail with the
    // expected width named, not BufferUnderflow or silent garbage
    import graft.plans.MinHashUnionAgg
    val agg = MinHashUnionAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), k = 4)
    val good = agg.serialize(agg.createAggregationBuffer())
    assert(good.length === 5 * 8)
    assert(agg.deserialize(good).length === 5)
    val narrow = java.util.Arrays.copyOf(good, 4 * 8) // k slots, flag missing
    val e = intercept[IllegalArgumentException](agg.deserialize(narrow))
    assert(e.getMessage.contains("expected 40"), e.getMessage)
  }

  test("graft_pq_adc: a packed code with residual high digits (p >= 17^8) is NULL") {
    val pow8 = math.pow(17, 8).toLong // eight 0 digits + residue 1
    val df = Seq((0L, pow8)).toDF("ok", "bad")
      .withColumn("lut", expr("transform(sequence(1, 128), x -> CAST(x AS BIGINT))"))
    val row = df.selectExpr("graft_pq_adc(ok, lut) AS a", "graft_pq_adc(bad, lut) AS b")
      .collect().head
    assert(!row.isNullAt(0), "a valid 8-digit pack still sums")
    assert(row.isNullAt(1), "residual digits must null, not sum the low digits")
  }

  test("graft_minhash: k <= 0 is a loud error, not an empty signature") {
    val err = intercept[Exception] {
      Seq("a b c").toDF("text")
        .selectExpr("graft_minhash(graft_shingles(text, 1), 0)").collect()
    }
    assert(err.getMessage.contains("k must be >= 1") ||
      Option(err.getCause).exists(_.getMessage.contains("k must be >= 1")),
      s"unexpected: ${err.getMessage}")
  }

  test("graft_minhash / graft_simhash: wrong-typed input is an analysis error, not runtime garbage") {
    val df = Seq(Seq(1L, 2L)).toDF("hashed")
    val e1 = intercept[Exception] { df.selectExpr("graft_minhash(hashed)").collect() }
    assert(e1.getMessage.contains("array<string>") ||
      e1.getMessage.toLowerCase.contains("data type mismatch"), e1.getMessage)
    val e2 = intercept[Exception] { df.selectExpr("graft_simhash(hashed)").collect() }
    assert(e2.getMessage.contains("array<string>") ||
      e2.getMessage.toLowerCase.contains("data type mismatch"), e2.getMessage)
  }
}
