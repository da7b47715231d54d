package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature expression (SURVEY.md §2.3 R18, §2.5).
  *
  * The higher-order-function formulation
  * `transform(sequence(0,k-1), s -> array_min(transform(sh, x -> xxhash64(x, s))))`
  * re-hashes every shingle STRING k times through interpreted lambda calls —
  * ~80 s on 5k docs. This expression does one xxhash64 pass over the
  * shingles and derives the k permutations with the standard multiply-add
  * trick (h_j = a_j·h + b_j over Z/2^64, a_j odd ⇒ a bijection, so each
  * (a_j, b_j) induces an independent min-wise permutation of hash space):
  * O(|sh|·k) integer ops, no per-seed string hashing. ~1000× less work,
  * same LSH banding downstream.
  *
  * Single-pass scalar expression ⇒ embarrassingly parallel at 100 TB.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  // loud at construction: k=0 would emit zero-length signatures (not
  // null), banding every doc identically downstream (code-review r17)
  require(k >= 1, s"graft_minhash: signature width k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  // analysis-time type check (the DotProduct discipline): an
  // array<bigint> argument (the hashed-shingle layout) would otherwise
  // reach getUTF8String and reinterpret long slots as offset+length
  // pairs — silently wrong signatures, not an error (code-review r17)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects array<string> shingles, got ${t.catalogString}")
    }

  /** Public twin of nullSafeEval for generated code — called through a
    * reference object so the enclosing WholeStageCodegen stage stays
    * fused (a CodegenFallback splits it for every co-resident expression).
    * May return null (empty shingle set), which the generated code maps
    * back to SQL NULL.
    */
  def compute(v: ArrayData): GenericArrayData =
    nullSafeEval(v).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  // deterministic permutation parameters (seed fixed for reproducibility)
  @transient private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x6772616674L) // "graft"
    Array.fill(k)(((rnd.nextLong() | 1L), rnd.nextLong()))
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n0 = arr.numElements()
    // Empty shingle set ⇒ NULL, matching the HOF form (array_min over an
    // empty transform is null). The old all-MaxValue sentinel made every
    // too-short doc IDENTICAL in signature space — one unfiltered caller
    // away from pairing all of them as estimated-Jaccard-1.0 near-dups.
    if (n0 == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = n0
    while (i < n) {
      // a null element nulls the signature (the DotProduct fail-safe
      // rule: never a plausible-looking partial result) — Shingles
      // output can't carry one, but SQL-built arrays can
      if (arr.isNullAt(i)) return null
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < k) {
        val p = perms(j)
        val hj = p._1 * h + p._2
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Session registration for graft's native expressions — callable from SQL
  * and from expr("...") column code. Idempotent per session.
  *
  * `builders` is the SINGLE source of truth consumed by both registration
  * paths (this per-session register and the cluster-wide GraftExtensions):
  * the function list, arities, and the signature width k cannot drift
  * between them. Builders validate arity and literal arguments with clear
  * messages instead of leaking IndexOutOfBounds / eval-on-attribute
  * internals at analysis time.
  */
object GraftFunctions {
  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n,
      s"$name expects $n argument(s), got ${exprs.length}")

  private def literalInt(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: the n argument must be an integer literal")
    val v = e.eval(null)
    require(v != null, s"$name: the n argument must be a non-null integer literal")
    v.asInstanceOf[Number].intValue()
  }

  /** (name, usage, builder) for every native function. */
  private[plans] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_minhash", "graft_minhash(shingles[, k]) - k-element MinHash signature (default 32)",
      exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"graft_minhash expects 1 or 2 argument(s), got ${exprs.length}")
        // k rides as a literal so sketch width is a plan-time choice: 32
        // (LSH banding consumes exactly 8 bands × 4 rows) stays the
        // default; estimate-quality callers widen it — the string hash is
        // computed once per shingle regardless, so width costs only the
        // multiply-add loop. Deterministic perms are prefix-stable: the
        // first 32 of a k=128 signature equal the k=32 signature.
        val k = if (exprs.length == 2) literalInt("graft_minhash", exprs(1)) else 32
        require(k >= 1, s"graft_minhash: k must be >= 1, got $k")
        MinHashSig(exprs.head, k)
      }),
    ("graft_shingles", "graft_shingles(text, n) - distinct n-word shingles",
      exprs => { arity("graft_shingles", exprs, 2)
        Shingles(exprs.head, literalInt("graft_shingles", exprs(1))) }),
    ("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash",
      exprs => { arity("graft_simhash", exprs, 1); SimHashSig(exprs.head) }),
    ("graft_minhash_union", "graft_minhash_union(sig[, k]) - group-level MinHash union (default k=32)",
      exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"graft_minhash_union expects 1 or 2 argument(s), got ${exprs.length}")
        // k must match the signatures being unioned (the agg fails loudly
        // on a width mismatch) — widened callers pass it explicitly
        val k = if (exprs.length == 2) literalInt("graft_minhash_union", exprs(1)) else 32
        require(k >= 1, s"graft_minhash_union: k must be >= 1, got $k")
        MinHashUnionAgg(exprs.head, k)
      }),
    ("graft_dot", "graft_dot(a, b) - dot product of double arrays",
      exprs => { arity("graft_dot", exprs, 2); DotProduct(exprs.head, exprs(1)) }),
    ("graft_jaccard", "graft_jaccard(a, b) - exact Jaccard of distinct-element string arrays",
      exprs => { arity("graft_jaccard", exprs, 2); JaccardSim(exprs.head, exprs(1)) }),
    ("graft_intersect_count", "graft_intersect_count(a, b) - distinct-intersection count of sorted long arrays",
      exprs => { arity("graft_intersect_count", exprs, 2)
        IntersectCount(exprs.head, exprs(1)) }),
    ("graft_cms_est", "graft_cms_est(sketch, item) - Count-Min sketch count estimate for a string item",
      exprs => { arity("graft_cms_est", exprs, 2); CmsEstimate(exprs.head, exprs(1)) }),
    ("graft_pq_encode", "graft_pq_encode(v, cbflat) - PQ [pq_code, mse_units] for a 64-dim vector vs a flat 8x16x8 codebook",
      exprs => { arity("graft_pq_encode", exprs, 2); PqEncode(exprs.head, exprs(1)) }),
    ("graft_pq_adc", "graft_pq_adc(pq_code, lut) - ADC lookup-sum of a base-17-packed code against a positional 128-entry LUT",
      exprs => { arity("graft_pq_adc", exprs, 2); PqAdc(exprs.head, exprs(1)) }),
    ("graft_pick_cell", "graft_pick_cell(v, nrm, cells) - IVF E-step argmax: struct(best, cell) by 4-dp-floored cosine, lowest cell on ties",
      exprs => { arity("graft_pick_cell", exprs, 3)
        PickCell(exprs.head, exprs(1), exprs(2)) }),
    // Runtime Bloom-filter pair — SQL registration of the machinery Spark
    // itself uses for runtime row-level join filtering (the optimizer's
    // InjectRuntimeFilter plans exactly these two expressions; Spark ships
    // them unregistered, so query code cannot opt in where the optimizer
    // declines). The agg builds an org.apache.spark.util.sketch.BloomFilter
    // over xxhash64'd join keys; the probe answers might-contain with zero
    // false negatives. Sizing literals are CAST to BIGINT here so callers
    // can write plain int literals in SQL.
    ("graft_bloom_agg",
      "graft_bloom_agg(xxhash64_key[, est_items, num_bits]) - Bloom filter binary over long keys",
      exprs => {
        require(exprs.length == 1 || exprs.length == 3,
          s"graft_bloom_agg expects 1 or 3 argument(s), got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.Cast
        if (exprs.length == 1) new BloomFilterAggregate(exprs.head)
        else new BloomFilterAggregate(exprs.head,
          Cast(exprs(1), LongType), Cast(exprs(2), LongType))
      }),
    ("graft_bloom_contains",
      "graft_bloom_contains(bloom, xxhash64_key) - might-contain probe (no false negatives)",
      exprs => { arity("graft_bloom_contains", exprs, 2)
        BloomFilterMightContain(exprs.head, exprs(1)) }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
