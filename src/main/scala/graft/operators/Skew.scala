package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins at scale. AQE's skew-join
  * handles sort-merge skew automatically; explicit salting is the tool
  * when a handful of keys dominate a shuffled equi-join (e.g. the 'the'
  * token in an inverted-index join, or a celebrity user id).
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side gets a deterministic
    * salt derived from its row content; the small side is replicated
    * `saltFactor` times so every (key, salt) bucket can match. Result is
    * row-identical to `big.join(small, key)` while spreading each hot key
    * over `saltFactor` reducers.
    *
    * `saltBy` must be deterministic per row (any column set); using
    * rand() would break retry/replay semantics.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, saltBy: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(saltFactor)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
