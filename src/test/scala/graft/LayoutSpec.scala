package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage-layout claims from SCALE.md, pinned as plan assertions: bucketing
  * removes the fact-fact exchange, and partitioned layout prunes at the scan.
  * These are the two levers that make the 100 TB deployment story concrete.
  */
class LayoutSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val warehouse = Files.createTempDirectory("graft_buckets").toString
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBcast = spark.conf.get(bcastKey)
    // disable broadcast so the join strategy at 100 TB (two big facts) is
    // what actually gets planned here
    spark.conf.set(bcastKey, "-1")
    try {
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/l").saveAsTable("graft_buck_l")
      Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/o").saveAsTable("graft_buck_o")

      val joined = spark.table("graft_buck_l")
        .join(spark.table("graft_buck_o"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, d).count())

      // same join on plain (unbucketed) parquet DOES shuffle — the baseline
      val unbucketed = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set(bcastKey, prevBcast)
      spark.sql("DROP TABLE IF EXISTS graft_buck_l")
      spark.sql("DROP TABLE IF EXISTS graft_buck_o")
    }
  }

  test("schema evolution: later generations add columns; mergeSchema unifies, old rows null") {
    val dir = Files.createTempDirectory("graft_evol").toString
    // generation 1: the original corpus schema
    Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .limit(10).write.parquet(s"$dir/docs/gen=1")
    // generation 2: quality score added by a later pipeline run
    Tables.documents(spark, d).select(col("doc_id"), col("text"),
        length(col("text")).cast("double").as("quality"))
      .limit(10).write.parquet(s"$dir/docs/gen=2")
    val unified = spark.read.option("mergeSchema", "true").parquet(s"$dir/docs")
    assert(unified.columns.toSet === Set("doc_id", "text", "quality", "gen"))
    val byGen = unified.groupBy("gen")
      .agg(count(lit(1)).as("n"), count(col("quality")).as("n_quality"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byGen(1) === ((10L, 0L)))  // old rows: quality null
    assert(byGen(2) === ((10L, 10L)))
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, d)
      .write.partitionBy("event_type").parquet(s"$dir/events")
    val scan = spark.read.parquet(s"$dir/events")
      .filter(col("event_type") === "purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("purchase"),
      s"no partition pruning in:\n$plan")
    // pruned scan reads exactly the one partition's rows
    val expected = Tables.events(spark, d)
      .filter(col("event_type") === "purchase").count()
    assert(scan.count() === expected)
  }

  test("dynamic partition pruning: a selective dim filter prunes the fact scan at runtime") {
    // The 100 TB star-join killer feature: the fact side is partitioned on
    // the join key, the dimension carries the selective filter, and Spark
    // injects a runtime subquery filter into the fact scan — only matching
    // partitions are read, without the user repeating the filter.
    val dir = Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_extendedprice"), (col("l_orderkey") % 10).as("okey_mod"))
      .write.partitionBy("okey_mod").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = Tables.orders(spark, d)
      .select(col("o_orderkey"), (col("o_orderkey") % 10).as("okey_mod"), col("o_orderpriority"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .filter(col("okey_mod") === 3) // selective partition predicate on the dim
    val joined = fact.join(dim, Seq("okey_mod"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in:\n${plan.take(1500)}")
    assert(joined.count() > 0)
  }

  test("runtime bloom-filter pruning: a selective dim side injects might_contain into the fact scan") {
    // The row-level sibling of DPP for non-partition join keys: Spark
    // builds a bloom filter from the selective (filtered) side and pushes
    // a might_contain probe into the big side's scan, skipping most fact
    // rows before the shuffle — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~matching slice.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-scale data sits under the production thresholds; floor them
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter in:\n${plan.take(1500)}")
      val expected = Tables.lineitem(spark, d).join(
        Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
