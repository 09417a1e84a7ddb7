package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of the whole graft SQL function library, so a
  * config-driven streaming pipeline's `sql` processor (or any plain
  * `spark.sql` user) can call the custom expressions — `minhash_sigs`,
  * `simhash_bits`, `hamming_distance`, `cdc_chunks`, `winnow_fps`,
  * `bpe_encode`, `ema`, the shims, … — without knowing which Scala
  * object hosts each one. Registration is idempotent
  * (`createOrReplaceTempFunction` throughout), so calling it per
  * micro-batch or per operator is safe.
  *
  * `weighted_percentile` is excluded: its registration is parameterized
  * by the fraction list (WeightedPercentile.register(spark, fractions))
  * and has no sensible session-wide default.
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    BandedLevenshtein.register(spark)
    Bpe.register(spark)
    CdcChunks.register(spark)
    CharEntropy.register(spark)
    DamerauLevenshtein.register(spark)
    DotProduct.register(spark)
    JaroWinkler.register(spark)
    EmaWindow.register(spark)
    HammingDistance.register(spark)
    MinhashSigs.register(spark)
    NormalizeOps.register(spark)
    Shims.register(spark)
    SimhashBits.register(spark)
    SpaceSavingTopK.register(spark)
    WinnowFps.register(spark)
  }
}
