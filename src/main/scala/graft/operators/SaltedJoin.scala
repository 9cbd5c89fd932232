package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side with a random
  * shard in [0, salts), replicate the small side across all shards, and
  * equi-join on (keys…, shard). Breaks a hot key's single reducer into
  * `salts` parallel ones at the cost of duplicating the build side —
  * the manual fallback when AQE's skew-join split cannot apply (e.g.
  * non-shuffle joins or pathological single-key skew). Total work is
  * unchanged; per-task work (and so straggler time) drops by ~`salts`.
  */
object SaltedJoin {

  /** Multi-column key form — each matching pair still joins exactly
    * once: a skewed-side row carries ONE shard, and only the replicated
    * side fans out. */
  def join(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String): DataFrame = {
    require(salts >= 1)
    val saltedLeft = skewed.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicatedRight = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  def join(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame =
    join(skewed, small, Seq(key), salts, joinType)
}
