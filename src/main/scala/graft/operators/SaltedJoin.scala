package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side with a random
  * shard in [0, salts), replicate the small side across all shards, and
  * equi-join on (key, shard). Breaks a hot key's single reducer into
  * `salts` parallel ones at the cost of duplicating the build side —
  * the manual fallback when AQE's skew-join split cannot apply (e.g.
  * non-shuffle joins or pathological single-key skew).
  */
object SaltedJoin {

  def join(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    val saltedLeft = skewed.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicatedRight = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
