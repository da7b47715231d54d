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
}
