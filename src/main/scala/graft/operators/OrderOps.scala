package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-dependent operators. PDAL leans on insertion order everywhere
  * (PointView is an ordered selection vector, pdal/PointView.hpp:338);
  * our analog is the explicit `order_key` column. Global ranks are
  * computed scalably: range-repartition on the order column, rank within
  * partitions, add per-partition offsets (collected counts are one row per
  * partition — never point data). No single-partition windows at scale.
  */
object Order {
  /** Dense 0-based global rank by `sortCols` as column `outCol`. */
  def globalRankBy(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // eager checkpoint pins the physical partitions: the counts job and the
    // rank job must see the SAME __pid mapping (AQE partition coalescing
    // can otherwise re-map partition ids between the two jobs)
    val ranged = graft.core.Mat(df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
    val offCol = element_at(
      array(offsets.take(maxPid + 1).map(lit): _*), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    ranged.withColumn(outCol, row_number().over(w).cast("long") - 1 + offCol)
      .drop("__pid")
  }

  def globalRank(df: DataFrame, orderCol: String = "order_key",
      outCol: String = "__rank", ascending: Boolean = true): DataFrame =
    globalRankBy(df, Seq(if (ascending) col(orderCol).asc else col(orderCol).desc), outCol)

  /** Dense 0-based rank by `sortCols` WITHIN each group of `groupCol`,
    * scalable to any group size: range-repartition on (group, sort...),
    * rank inside physical partitions (group runs are contiguous in range
    * order), then add per-(partition, group) offsets. The collected
    * offset table is one row per (partition, group-present-in-partition)
    * — bounded by partitions + groups, never point data. */
  def globalRankWithin(df: DataFrame, groupCol: String, sortCols: Seq[Column],
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = graft.core.Mat(
      df.repartitionByRange(parts, (col(groupCol) +: sortCols): _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy("__pid", groupCol).count().collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2))
    // offset of (pid, g) = total count of g in lower pids
    val offsets = counts.groupBy(_._1._2).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._1._1).toSeq.map { case ((pid, _), n) =>
        val o = acc; acc += n; (pid, g, o)
      }
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map(o => Row(o._1, o._2, o._3)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(groupCol, df.schema(groupCol).dataType),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(sortCols: _*)
    // null-safe group equality: a plain equi-join would silently drop
    // every row whose group value is null
    val off2 = offDf.withColumnRenamed("__pid", "__opid")
      .withColumnRenamed(groupCol, "__ogrp")
    ranged.join(broadcast(off2),
        col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn(outCol, row_number().over(w).cast("long") - 1 + col("__off"))
      .drop("__pid", "__opid", "__ogrp", "__off")
  }

  /** Inclusive running sum of the INTEGRAL `valueCol` in global
    * `order_key` order: range-repartition, per-partition running sum,
    * plus per-partition total offsets (one collected row per partition).
    * The value is cast to long (null -> 0) — a generic double running
    * sum would need different offset typing. */
  def globalPrefixSum(df: DataFrame, valueCol: Column, outCol: String): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val ranged = graft.core.Mat(
      df.withColumn("__v", coalesce(valueCol.cast("long"), lit(0L)))
        .repartitionByRange(parts, col("order_key"))
        .withColumn("__pid", spark_partition_id()))
    val sums = ranged.groupBy("__pid").agg(sum("__v").as("s")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val maxPid = if (sums.isEmpty) 0 else sums.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, pid) => acc + sums.getOrElse(pid, 0L))
    val offCol = element_at(array(offsets.take(maxPid + 1).map(lit): _*), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy("order_key")
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.withColumn(outCol, coalesce(sum("__v").over(w), lit(0L)) + offCol)
      .drop("__pid", "__v")
  }

  /** Inclusive running sums of several DOUBLE value columns in a global
    * sort order, same range-partition + per-partition-offset shape as
    * globalPrefixSum. Floating-point caveat: within a partition the sum
    * is sequential in sort order; across partitions the per-partition
    * totals are added as offsets — associativity differences vs a fully
    * sequential scan are possible for ill-conditioned data (exact when
    * the values are integer multiples of a power of two well inside the
    * 53-bit mantissa, as the skewness-balancing driver query arranges). */
  def globalPrefixSumsD(df: DataFrame, sortCols: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val withVals = values.zipWithIndex.foldLeft(df) { case (d, ((v, _), i)) =>
      d.withColumn(s"__v$i", coalesce(v.cast("double"), lit(0.0)))
    }
    val ranged = graft.core.Mat(withVals.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val sums = ranged.groupBy("__pid")
      .agg(values.indices.map(i => sum(s"__v$i").as(s"s$i")).head,
        values.indices.map(i => sum(s"__v$i").as(s"s$i")).tail: _*)
      .collect()
      .map(r => r.getInt(0) -> values.indices.map(i =>
        if (r.isNullAt(i + 1)) 0.0 else r.getDouble(i + 1)).toArray).toMap
    val maxPid = if (sums.isEmpty) 0 else sums.keys.max
    val zero = Array.fill(values.size)(0.0)
    val offsets = (0 to maxPid).scanLeft(zero) { (acc, pid) =>
      val s = sums.getOrElse(pid, zero)
      acc.zip(s).map { case (a, b) => a + b }
    }
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = values.zipWithIndex.foldLeft(ranged) { case (d, ((_, name), i)) =>
      val offCol = element_at(
        array(offsets.take(maxPid + 1).map(o => lit(o(i))): _*), col("__pid") + 1)
      d.withColumn(name, coalesce(sum(s"__v$i").over(w), lit(0.0)) + offCol)
    }
    out.drop("__pid").drop(values.indices.map(i => s"__v$i"): _*)
  }
}

/** filters.sort analog (filters/SortFilter.cpp:42): stable sort by one
  * dimension — stability reproduced with the order_key tiebreaker
  * (pdal/PointView.hpp:308 stableSort). The sort manifests as the output
  * order_key so downstream order-dependent stages see the sorted order. */
object Sort {
  def apply(df: DataFrame, dim: String, ascending: Boolean = true): DataFrame = {
    val keys =
      if (ascending) Seq(col(dim).asc, col("order_key").asc)
      else Seq(col(dim).desc, col("order_key").asc) // stable: ties keep order
    Order.globalRankBy(df, keys, "__newkey")
      .drop("order_key").withColumnRenamed("__newkey", "order_key")
  }
}

/** filters.head / filters.tail (filters/HeadFilter.cpp:41 / TailFilter.cpp):
  * first/last `count` points in order; `invert` keeps the complement. */
object HeadTail {
  def head(df: DataFrame, count: Long, invert: Boolean = false): DataFrame = {
    if (!invert && count <= Int.MaxValue)
      // TakeOrderedAndProject — no global rank shuffle for a plain LIMIT
      return df.orderBy("order_key").limit(count.toInt)
    val ranked = Order.globalRank(df)
    val p = col("__rank") < count
    ranked.filter(if (invert) !p else p).drop("__rank")
  }
  def tail(df: DataFrame, count: Long, invert: Boolean = false): DataFrame = {
    val n = df.count()
    val ranked = Order.globalRank(df)
    val p = col("__rank") >= (n - count)
    ranked.filter(if (invert) !p else p).drop("__rank")
  }
}

/** filters.locate (filters/LocateFilter.cpp:45): argmin/argmax of a dim.
  * Single-row result via min_by/max_by — one aggregate, no sort. */
object Locate {
  def apply(df: DataFrame, dim: String, minimum: Boolean): DataFrame = {
    val picker = if (minimum) min_by(col("order_key"), struct(col(dim), col("order_key")))
                 else max_by(col("order_key"), struct(col(dim), -col("order_key")))
    val key = df.agg(picker.as("k")).head().getLong(0)
    df.filter(col("order_key") === key)
  }
}

/** filters.decimation (filters/DecimationFilter.cpp:45): keep every
  * step-th point of [offset, limit) in order. */
object Decimation {
  def apply(df: DataFrame, step: Long, offset: Long = 0,
      limit: Long = Long.MaxValue): DataFrame = {
    val ranked = Order.globalRank(df)
    ranked.filter(col("__rank") >= offset && col("__rank") < limit &&
      pmod(col("__rank") - offset, lit(step)) === 0).drop("__rank")
  }
}

/** filters.randomize (filters/RandomizeFilter.cpp:41): deterministic
  * seeded shuffle — new order = rank of a seeded hash of the old key.
  * The hash is the codegen'd splitmix64 finalizer (engine-independent
  * arithmetic, so an external engine can replay the permutation). */
object Randomize {
  def apply(df: DataFrame, seed: Long): DataFrame = {
    val hashed = df.withColumn("__h",
      graft.functions.F.mix64(col("order_key") + lit(seed)))
    Order.globalRankBy(hashed, Seq(col("__h").asc, col("order_key").asc), "__newkey")
      .drop("__h").drop("order_key").withColumnRenamed("__newkey", "order_key")
  }
}

/** filters.mortonorder (filters/MortonOrderFilter.cpp:46): reorder by
  * Z-order curve over quantized (x, y). `reverse` is the reference's
  * BIT-REVERSED Morton code (MortonOrderFilter.cpp:103 reverse_morton) —
  * a progressive-sampling order that scatters spatial neighbors, NOT the
  * descending Z-order. */
object MortonOrder {
  /** result = ((v >> s) & m) | ((v & m) << s) cascade — 64-bit bit
    * reversal as pure column ops (stays in whole-stage codegen). */
  private def rev64(c0: Column): Column = {
    def sw(v: Column, sh: Int, m: Long): Column =
      shiftrightunsigned(v, sh).bitwiseAND(lit(m))
        .bitwiseOR(shiftleft(v.bitwiseAND(lit(m)), sh))
    var v = c0
    v = sw(v, 1, 0x5555555555555555L)
    v = sw(v, 2, 0x3333333333333333L)
    v = sw(v, 4, 0x0F0F0F0F0F0F0F0FL)
    v = sw(v, 8, 0x00FF00FF00FF00FFL)
    v = sw(v, 16, 0x0000FFFF0000FFFFL)
    shiftrightunsigned(v, 32).bitwiseOR(shiftleft(v, 32))
  }

  def apply(df: DataFrame, reverse: Boolean = false, cellSize: Double = 0.01): DataFrame = {
    val mnArr = df.agg(min("x"), min("y")).take(1)
    if (mnArr.isEmpty || mnArr(0).isNullAt(0)) return df // empty input
    val mn = mnArr(0)
    val (ox, oy) = (mn.getDouble(0), mn.getDouble(1))
    val code = graft.functions.F.cellId(col("x"), col("y"), ox, oy, cellSize, morton = true)
    val hashed = df.withColumn("__m", if (reverse) rev64(code) else code)
    Order.globalRankBy(hashed, Seq(col("__m").asc, col("order_key").asc), "__newkey")
      .drop("__m").drop("order_key").withColumnRenamed("__newkey", "order_key")
  }
}
