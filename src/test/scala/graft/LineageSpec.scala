package graft

import graft.operators.Lineage

import java.nio.file.Files

/** VERDICT r13 #4: the iterative operators' lineage cuts honor the opt-in
  * reliable-checkpoint conf (`spark.graft.checkpoint.dir`) and produce
  * results identical to the default localCheckpoint path.
  */
class LineageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Run `name` from the registry and return its rows as sorted strings
    * (the queries end in a deterministic orderBy; string form sidesteps
    * Row equality over nested arrays).
    */
  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("reliable checkpoint path: identical results, blocks actually on disk") {
    val dir = Files.createTempDirectory("graft-ckpt").toFile
    // iterative representatives: label propagation (ConnectedComponents),
    // the 3-step Lloyd trainer (SimilarityQueries), the recursive CTE
    // (DeepRelational) — every family Lineage.cut now routes
    val names = Seq("g_components", "v_ivfpq_trained", "q_recursive_cte")
    val local = names.map(n => n -> rows(n)).toMap
    spark.conf.set(Lineage.ReliableDirConf, dir.getAbsolutePath)
    try {
      val reliable = names.map(n => n -> rows(n)).toMap
      names.foreach { n =>
        assert(reliable(n) === local(n), s"$n must not change under reliable cuts")
      }
      // the reliable path genuinely engaged: checkpoint blocks were written
      def fileCount(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(fileCount).sum else 1
      assert(fileCount(dir) > 0, "no checkpoint files written — cut() did not take the reliable path")
    } finally {
      spark.conf.unset(Lineage.ReliableDirConf)
    }
    // and back on the default path after unset: still identical
    assert(rows("g_components") === local("g_components"))
  }

  // ---- cutSuperseding (VERDICT r15 #4 / r16 #5): it deletes checkpoint
  // files behind a path-prefix guard in four production iterative loops
  // (ConnectedComponents, GraphQueries pagerank, the Lloyd trainers) —
  // direct coverage of the reclamation contract, both modes, 4 rounds.

  private def rddDirs(root: java.io.File): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) :+ f else Seq(f)
    walk(root).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      .map(_.getName)
  }

  test("cutSuperseding (reliable): supersedes delete, footprint stays at 1 generation, result exact") {
    val root = Files.createTempDirectory("graft-ckpt-sup").toFile
    spark.conf.set(Lineage.ReliableDirConf, root.getAbsolutePath)
    try {
      var cur = Lineage.cut(spark.range(100).toDF("v"))
      assert(rddDirs(root).size === 1, "the seed cut must have checkpointed")
      for (r <- 1 to 4) {
        // the per-round pattern the production loops use:
        // cur = cutSuperseding(step(cur), cur)
        cur = Lineage.cutSuperseding(cur.selectExpr("v + 1 AS v"), cur)
        val dirs = rddDirs(root)
        assert(dirs.size === 1,
          s"round $r left ${dirs.size} checkpoint generations on disk: $dirs " +
            "(supersede must free the previous round deterministically)")
      }
      // values survived 4 rounds of +1 over a freed-and-replaced lineage
      assert(cur.selectExpr("sum(v)").head.getLong(0) ===
        (0L until 100).map(_ + 4).sum)
    } finally spark.conf.unset(Lineage.ReliableDirConf)
  }

  test("cutSuperseding (reliable): never deletes outside the configured checkpoint root") {
    val dirA = Files.createTempDirectory("graft-ckpt-a").toFile
    val dirB = Files.createTempDirectory("graft-ckpt-b").toFile
    def fileCount(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(fileCount).sum else 1
    spark.conf.set(Lineage.ReliableDirConf, dirA.getAbsolutePath)
    try {
      val first = Lineage.cut(spark.range(10).toDF("v"))
      val before = fileCount(dirA)
      assert(before > 0)
      // re-point the root between cuts: `first`'s checkpoint now lives
      // OUTSIDE the configured dir — the mis-wired-frame shape the
      // path-prefix guard exists for. Nothing in dirA may be deleted.
      spark.conf.set(Lineage.ReliableDirConf, dirB.getAbsolutePath)
      val second = Lineage.cutSuperseding(first.selectExpr("v + 1 AS v"), first)
      assert(second.count() === 10)
      assert(fileCount(dirA) === before,
        "a supersede whose prev lives outside the configured root must not touch it")
    } finally spark.conf.unset(Lineage.ReliableDirConf)
  }

  test("cutSuperseding (local): superseded blocks unpersist, ≤ 2 generations resident, result exact") {
    val sc = spark.sparkContext
    val preexisting = sc.getPersistentRDDs.keySet
    var cur = Lineage.cut(spark.range(1000).toDF("v"))
    for (r <- 1 to 4) {
      cur = Lineage.cutSuperseding(cur.selectExpr("v + 1 AS v"), cur)
      val live = sc.getPersistentRDDs.keySet.diff(preexisting)
      // current generation, plus at most the in-flight unpersist of prev
      assert(live.size <= 2,
        s"round $r holds ${live.size} loop generations in the block manager " +
          "(supersede must unpersist the previous localCheckpoint)")
    }
    assert(cur.selectExpr("sum(v)").head.getLong(0) ===
      (0L until 1000).map(_ + 4).sum)
  }
}
