package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("R21: asset schema carries binary payload + typed metadata") {
    val df = Multimodal.assets(spark, "/root/testdata/sf0.001")
    assert(df.schema.fieldNames.toSeq === Seq("asset_id", "modality", "payload", "meta"))
    val r = df.orderBy("asset_id").select(
      col("asset_id"), octet_length(col("payload")).as("pl"), col("meta.n_bytes"),
      length(col("meta.sha"))).head()
    assert(r.getInt(1).toLong === r.getLong(2)) // payload length == metadata
    assert(r.getInt(3) === 64)                  // sha256 hex
  }

  test("R21: decode stub is deterministic and partition-batched") {
    val in = Multimodal.assets(spark, "/root/testdata/sf0.001").limit(10)
    val f1 = Multimodal.decodeStub(spark, in).orderBy("asset_id").collect()
    val f2 = Multimodal.decodeStub(spark, in.repartition(3)).orderBy("asset_id").collect()
    assert(f1.map(_.toString).toSeq === f2.map(_.toString).toSeq) // partitioning-invariant
    assert(f1.forall(_.getSeq[Double](3).length === 8))
    assert(f1.forall(r => r.getLong(2) > 0))
  }
}
