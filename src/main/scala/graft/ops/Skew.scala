package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for joins at scale.
  *
  * First line of defense is AQE's skew-join splitting (on by default in
  * this engine's sessions). Salting is for the cases AQE can't fix:
  * a skewed *broadcast-ineligible* join where one key dominates — salt
  * the fact side N ways and explode the dimension side across all N
  * salts, turning one hot partition into N even ones. Deterministic
  * (salt = pmod(hash(row-id-ish columns), N)), no RNG.
  */
object Skew {

  /** Salted equi-join: `fact ⋈ dim ON fact(key) = dim(key)` with the hot
    * keys spread over `salts` partitions. dim is replicated ×salts (keep
    * it the smaller side). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // fact rows get a deterministic salt from a spread of their columns
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) && saltedFact("_salt") === saltedDim("_salt"),
        joinType)
      .drop(saltedDim(key)).drop("_salt")
  }

  /** Top-N heavy hitters for a key — the diagnostic you run before
    * deciding to salt. One pass, map-side combined. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
