package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns (SURVEY.md §2.3 R19),
  * built from codegen-friendly higher-order functions — no UDFs, so the
  * DuckDB oracle can mirror the arithmetic exactly.
  *
  * Precision contract: inputs are cast to ARRAY<DOUBLE> before any multiply,
  * so Spark and the oracle compute sums of bit-identical double products and
  * differ only in summation order (~1e-16 relative) — ROUND(...,4) in both
  * engines is then deterministic.
  *
  * Scale: these are per-row scalar expressions (no shuffle). The O(n²)
  * all-pairs shape must never be materialized at 100 TB — see
  * SimilarityQueries for the LSH-bucketed path that bounds the join.
  */
object VectorFunctions {

  /** Cast ARRAY<FLOAT> → ARRAY<DOUBLE> (precision contract above). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product — a native expression (graft.plans.DotProduct): one
    * primitive loop instead of interpreted per-element lambdas, summing in
    * index order so results are bit-identical to the left-fold HOF form
    * (and to the oracle's per-index join + sum).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  }

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Cosine from precomputed norms (pair-join fast path): same null-safe
    * zero-vector guard as [[cosine]] — under Spark 4's default ANSI mode a
    * raw division would abort the query with DIVIDE_BY_ZERO.
    */
  def cosineFromNorms(dotAB: Column, normA: Column, normB: Column): Column =
    when(normA * normB > 0, dotAB / (normA * normB))

  /** Sign-random-projection LSH bucket id (Charikar's SimHash for vectors):
    * bit p of the bucket = sign of <v, plane_p>. Planes are deterministic
    * (seeded) so the operator is reproducible run-to-run. nPlanes ≤ 30.
    *
    * At scale this turns the O(n²) neighbor join into a per-bucket join:
    * shuffle on bucket id, join within buckets only.
    */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(p.map(lit)): _*)
      when(dot(v, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic hyperplanes for [[lshBucket]]. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
