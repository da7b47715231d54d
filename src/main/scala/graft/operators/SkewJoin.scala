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
    * smaller side. Demonstration form: salts EVERY key — simple, but the
    * small side is replicated wholesale; production uses
    * [[saltedEquiJoinHotKeys]].
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

  /** Production skew join: detect the hot keys first (one cheap aggregate —
    * keys whose big-side count exceeds `hotThreshold`), salt ONLY those,
    * and run every other key through the plain join path. The small side is
    * replicated ×salts only for the (few) hot keys, not wholesale, and the
    * non-skewed bulk pays no salting overhead at all. The hot-key set is
    * broadcast (it is at most a handful of keys by construction — each one
    * carries > hotThreshold rows, so there can only be |big|/hotThreshold
    * of them). Result-identical to the plain join: the two paths partition
    * the key space, and within each path every big-side row still meets
    * each matching small-side row exactly once.
    */
  def saltedEquiJoinHotKeys(big: DataFrame, small: DataFrame, key: String,
                            salts: Int, hotThreshold: Long): DataFrame = {
    require(salts >= 1 && hotThreshold >= 1)
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .select(col(key).as("__hotkey"))
    val bigHot = big.join(broadcast(hot), big(key) === col("__hotkey"), "inner")
      .drop("__hotkey")
    val bigCold = big.join(broadcast(hot), big(key) === col("__hotkey"), "left_anti")
    val smallHot = small.join(broadcast(hot), small(key) === col("__hotkey"), "inner")
      .drop("__hotkey")
    val smallCold = small.join(broadcast(hot), small(key) === col("__hotkey"), "left_anti")
    val saltedHot = saltedEquiJoin(bigHot, smallHot, key, salts)
    // align column order before the union (join reorders key columns)
    val plainCold = bigCold.join(smallCold, Seq(key), "inner")
    saltedHot.unionByName(plainCold)
  }
}
