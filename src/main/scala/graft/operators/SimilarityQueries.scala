package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.ParityMath.floorRound
import org.apache.spark.sql.functions._

/** Vector similarity search over the `embeddings` table (SURVEY.md §2.3
  * R19): brute-force cosine as the verifiable baseline, sign-LSH bucketed
  * join as the scale path.
  *
  * Scale design: probe-vs-corpus is O(n) per probe — a broadcast of the
  * probe row against a full scan, embarrassingly parallel, this is the shape
  * that survives 100 TB. All-pairs is never materialized: the LSH variant
  * shuffles once on a bucket id (hamming-1 multiprobe keeps recall up) and
  * joins only within buckets, so cost is Σ bucket² ≪ n².
  */
object SimilarityQueries {

  private val KDim = 64

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R19 baseline — cosine of every vector against the vec_id=0 probe.
    // Broadcast the single probe row; the big side streams through a scalar
    // expression (no shuffle at all).
    "v_cosine_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val probe = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("q"))
      e.join(broadcast(probe))
        .select(col("vec_id"),
          floorRound(cosine(asDouble(col("embedding")), col("q")), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // R19 — top-k nearest neighbors of the probe (k=20), ordered on the
    // rounded score so Spark and the oracle agree on ties deterministically.
    // TakeOrderedAndProject: per-partition top-k, single-reduce merge.
    "v_knn_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val probe = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("q"))
      e.join(broadcast(probe))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          floorRound(cosine(asDouble(col("embedding")), col("q")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(20)
    }),

    // R19 scale path — approximate nearest neighbor per vector via sign-LSH:
    // 12 deterministic hyperplanes → bucket id; hamming-1 multiprobe (emit
    // the home bucket plus all 12 one-bit flips) so near neighbors split by
    // one plane are still found; join within buckets only; best match per
    // vector by rounded cosine. Hash/plane-specific ⇒ rows-only check;
    // recall is unit-tested in SimilaritySpec.
    "v_ann_lsh" -> ((s, d) => {
      val planes = hyperplanes(12, KDim)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), planes))
        .withColumn("nrm", l2Norm(col("v"))) // norm once per vector, not per pair
      // multiprobe: home bucket + hamming-1 neighbors, as probe keys
      val probes = e.select(col("vec_id"), col("v"), col("nrm"), col("bucket"),
        explode(array((lit(-1L) +: (0 until 12).map(i => lit(i.toLong))): _*)).as("flip"))
        .select(col("vec_id"), col("v"), col("nrm"),
          when(col("flip") === -1L, col("bucket"))
            .otherwise(expr("bucket ^ shiftleft(1L, flip)")).as("probe_bucket"))
        .dropDuplicates("vec_id", "probe_bucket")
      val pairs = probes.as("a")
        .join(e.as("b"), col("a.probe_bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn"),
          floorRound(cosineFromNorms(dot(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")), 4).as("cosine"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nn"))
      pairs.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id"), col("nn"), col("cosine"))
        .orderBy("vec_id")
    }),

    // R19/R18 bridge — embedding-cosine near-duplicate candidates: the
    // top-10 most-similar within-bucket pairs from the same LSH buckets. In
    // production this would carry a `cosine >= threshold` near-dup cut; the
    // synthetic embeddings are near-orthogonal (max pairwise cos ≈ 0.5), so
    // the query surfaces the candidate ranking instead of an empty set.
    // Rows-only check (hash/plane-specific).
    "v_neardup_cosine" -> ((s, d) => {
      val planes = hyperplanes(12, KDim)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), planes))
        .withColumn("nrm", l2Norm(col("v")))
      e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          floorRound(cosineFromNorms(dot(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
        .limit(10)
    }),

    // R19 scale path #2 — IVF (inverted-file) ANN: a deterministic coarse
    // quantizer (every 13th vector is a centroid), each vector assigned to
    // its nearest centroid cell (nprobe=2 at query time: best two cells),
    // neighbors searched within probed cells only. Centroids broadcast;
    // one shuffle on cell id; cost Σ cell² ≪ n². Complements v_ann_lsh —
    // IVF adapts to the data distribution where LSH is data-oblivious.
    // Rows-only check; recall spec in SimilaritySpec.
    "v_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", l2Norm(col("v")))
      val centroids = e.filter(col("vec_id") % 13 === 0)
        .select(col("vec_id").as("cell"), col("v").as("cv"))
      // rank cells per vector by cosine; keep best 2 (nprobe)
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("cell_cos").desc, col("cell"))
      val assigned = e.join(broadcast(centroids))
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
          cosine(col("v"), col("cv")).as("cell_cos"))
        .withColumn("cell_rank", row_number().over(wCell))
        .filter(col("cell_rank") <= 2)
      // members live in their best cell; probes search their best 2 cells
      val members = assigned.filter(col("cell_rank") === 1)
        .select(col("cell"), col("vec_id").as("m_id"), col("v").as("m_v"),
          col("nrm").as("m_nrm"))
      val wBest = Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nn"))
      assigned.as("p")
        .join(members.as("m"),
          col("p.cell") === col("m.cell") && col("p.vec_id") =!= col("m.m_id"))
        .select(col("p.vec_id").as("vec_id"), col("m.m_id").as("nn"),
          floorRound(cosineFromNorms(dot(col("p.v"), col("m.m_v")), col("p.nrm"), col("m.m_nrm")), 4).as("cosine"))
        .withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("nn"), col("cosine"))
        .orderBy("vec_id")
    }),

    // R19 aggregate view — label centroids + intra-label cohesion: mean
    // vector per label (element-wise), then each member's cosine to its
    // centroid, averaged. Exercises array aggregation at scale (posexplode →
    // groupBy(label, pos) partial aggs — linear, shuffle on (label, pos)).
    "v_label_cohesion" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val centroids = e
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label"), expr("transform(pm, p -> p.m)").as("centroid"))
        .withColumn("cnrm", l2Norm(col("centroid")))
      e.join(broadcast(centroids), "label")
        .select(col("label"),
          cosineFromNorms(dot(col("v"), col("centroid")), l2Norm(col("v")), col("cnrm")).as("c"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), floorRound(avg(col("c")), 4).as("avg_cohesion"))
        .orderBy("label")
    })
  )

  val oracles: Map[String, String] = Map(
    "v_label_cohesion" ->
      """WITH ex AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         cent AS (SELECT label, i, avg(e) AS m FROM ex GROUP BY label, i),
         dots AS (
           SELECT ex.vec_id, ex.label,
                  sum(ex.e * cent.m) AS dot, sum(ex.e * ex.e) AS na
           FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
           GROUP BY ex.vec_id, ex.label),
         cn AS (SELECT label, sum(m * m) AS nb FROM cent GROUP BY label)
         SELECT d.label, CAST(count(*) AS BIGINT) AS n,
                floor((avg(d.dot / (sqrt(d.na) * sqrt(cn.nb)))) * 10000 + 0.5) / 10000 AS avg_cohesion
         FROM dots d JOIN cn ON d.label = cn.label
         GROUP BY d.label ORDER BY d.label""",
    "v_cosine_probe" ->
      """WITH ex AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qx AS (SELECT e, i FROM ex WHERE vec_id = 0),
         dots AS (
           SELECT ex.vec_id, sum(ex.e * qx.e) AS dot, sum(ex.e * ex.e) AS na
           FROM ex JOIN qx ON ex.i = qx.i GROUP BY ex.vec_id),
         qn AS (SELECT sum(e * e) AS nb FROM qx)
         SELECT vec_id, floor((dot / (sqrt(na) * sqrt(nb))) * 10000 + 0.5) / 10000 AS cosine
         FROM dots, qn ORDER BY vec_id""",
    "v_knn_probe" ->
      """WITH ex AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qx AS (SELECT e, i FROM ex WHERE vec_id = 0),
         dots AS (
           SELECT ex.vec_id, sum(ex.e * qx.e) AS dot, sum(ex.e * ex.e) AS na
           FROM ex JOIN qx ON ex.i = qx.i GROUP BY ex.vec_id),
         qn AS (SELECT sum(e * e) AS nb FROM qx)
         SELECT d.vec_id, emb.label, floor((d.dot / (sqrt(d.na) * sqrt(qn.nb))) * 10000 + 0.5) / 10000 AS cosine
         FROM dots d JOIN embeddings emb ON emb.vec_id = d.vec_id CROSS JOIN qn
         WHERE d.vec_id <> 0
         ORDER BY cosine DESC, d.vec_id LIMIT 20"""
  )
}
