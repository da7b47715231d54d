package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for pathologically skewed equi-joins (SURVEY.md §4;
  * SCALE.md "skew").
  *
  * AQE's skew-join splitting handles most skew transparently, but it only
  * splits partitions of a sort-merge/shuffled-hash join — when one key is so
  * hot that a single key's rows exceed an executor (the "one routing key is
  * 90% of traffic" case), salting is the classic explicit remedy: the big
  * side scatters each hot key over `salts` sub-keys, the small side
  * replicates each row `salts` times, and the join key becomes
  * (key, salt) — fanning one reducer's work across `salts` reducers.
  *
  * Correctness: every big-side row meets exactly one copy of each matching
  * small-side row (its own salt), so the join result is identical to the
  * unsalted join.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `salts` ways.
    * `small` is replicated ×salts (explode), so keep it the genuinely
    * smaller side.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int): DataFrame = {
    require(salts >= 1)
    val saltCol: Column = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    val b = big.withColumn("__salt", saltCol.cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    b.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
