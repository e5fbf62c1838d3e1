package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Explicit skew handling for dense cells (north rule: "skew from dense
  * cells is handled by salted repartitioning with AQE skew-join
  * splitting"; SURVEY §7.4.5).
  *
  * AQE's skew-join splitting covers the join paths automatically (enabled
  * in GraftSession); this module covers the cases AQE cannot: hot KEYS in
  * aggregations/partitionBy-writes, where one dense tile would pin a
  * single task/file writer.
  */
object Skew {

  /** Hot keys of `keyCol`: keys holding more than `factor` x the mean
    * rows-per-key (one aggregate over the key column only). */
  def hotKeys(df: DataFrame, keyCol: String, factor: Double = 8.0): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    val mean = counts.agg(avg("__n")).head().getDouble(0)
    counts.filter(col("__n") > mean * factor).select(keyCol, "__n")
  }

  /** Salted repartition: rows of hot keys spread over `salt` buckets,
    * cold keys keep salt 0 — downstream per-(key, salt) work is bounded
    * while cold keys avoid the fan-out entirely. Deterministic salt from
    * order_key (mix64), never random. */
  def saltedRepartition(df: DataFrame, keyCol: String, salt: Int = 16,
      hotFactor: Double = 8.0): DataFrame = {
    val hot = broadcast(hotKeys(df, keyCol, hotFactor)
      .select(col(keyCol), lit(true).as("__hot")))
    df.join(hot, Seq(keyCol), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(F.mix64(col("order_key")), lit(salt.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
      .repartition(col(keyCol), col("__salt"))
  }

  /** Two-level salted aggregation for count-like per-key aggs: partial
    * per (key, salt), final per key — the classic skew-proof shape. */
  def saltedCount(df: DataFrame, keyCol: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(F.mix64(col("order_key")), lit(salt.toLong)))
      .groupBy(col(keyCol), col("__salt")).agg(count(lit(1)).as("__pc"))
      .groupBy(keyCol).agg(sum("__pc").as("n"))
}
