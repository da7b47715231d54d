package graft

import org.apache.spark.sql.functions._

/** Edge-case behavior of the native expressions (graft.plans). */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

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

  test("graft_minhash: empty shingle array yields all-MaxValue signature; null in, null out") {
    val df = Seq(Some(Seq.empty[String]), None).toDF("sh")
    val rows = df.select(expr("graft_minhash(sh)").as("sig")).collect()
    assert(rows(0).getSeq[Long](0).forall(_ == Long.MaxValue))
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
}
