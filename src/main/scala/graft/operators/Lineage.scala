package graft.operators

import org.apache.spark.sql.DataFrame

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
  * queries; the checkpoint dir is applied to the SparkContext on first
  * reliable cut (and re-applied if the conf value changes).
  *
  * Reliable cuts are strictly slower per round (a cluster-FS write +
  * read vs executor memory) — this is fault-tolerance pricing, not a
  * performance path, which is why local stays the default.
  */
object Lineage {

  /** Conf key: when set (non-empty), cuts are reliable checkpoints into
    * this directory; when unset, cuts are localCheckpoints.
    */
  val ReliableDirConf = "spark.graft.checkpoint.dir"

  // last dir applied to SparkContext.setCheckpointDir — avoids re-creating
  // a fresh checkpoint subdirectory on every cut (setCheckpointDir makes a
  // new UUID subdir per call)
  private val appliedDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Truncate `df`'s lineage: reliable `checkpoint(eager)` when
    * [[ReliableDirConf]] is set, `localCheckpoint(eager)` otherwise.
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (appliedDir.getAndSet(dir) != dir)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None =>
        df.localCheckpoint(eager)
    }
  }
}
