package graft.ann

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exactness baseline;
  * IVF is the 100TB scale path: the corpus is pre-partitioned into nlist
  * coarse cells, queries probe only nprobe cells — candidate volume
  * drops by nlist/nprobe while the rerank inside probed cells stays
  * exact.
  *
  * Centroid assignment runs as a tight primitive-array argmax over a
  * BROADCAST centroid matrix inside mapPartitions (nlist * dim * 8 bytes
  * — nlist 10^5 at dim 100 is ~80 MB, broadcastable), so nlist is no
  * longer bounded by expression-tree size. At nlist beyond ~10^5 swap
  * the flat argmax for an HNSW/k-means-tree over centroids — the
  * partition layout and probe semantics stay identical. */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12))

  /** Exact brute-force cosine top-k: every query scores the full corpus
    * (one broadcast of queries, one shuffle on query id for the window).
    * @return (query_id, vec_id, cosine, rank) */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .join(q, col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  private def unitCol(vecCol: String): Column =
    transform(col(vecCol), x =>
      x.cast("double") / greatest(norm(col(vecCol)), lit(1e-12)))

  /** (id, unit-vector, argmax-dot cell) via broadcast centroids. */
  private def assignCells(df: DataFrame,
      cents: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Array[Double] decode: primitive-backed, no per-component boxing
    df.select(col("id"), col("u")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = cents.value
        it.map { case (id, v) =>
          var best = 0; var bs = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val cv = cs(c); var s = 0.0; var j = 0
            val n = math.min(v.length, cv.length)
            while (j < n) { s += v(j) * cv(j); j += 1 }
            if (s > bs) { bs = s; best = c }
            c += 1
          }
          (id, v, best)
        }
      }.toDF("id", "u", "cell")
  }

  /** (id, unit-vector, top-nprobe cells by dot) via broadcast centroids. */
  private def probeCells(df: DataFrame,
      cents: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nprobe: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("u")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = cents.value
        it.map { case (id, v) =>
          // top-nprobe via insertion into fixed arrays (nprobe is small)
          val np = math.min(nprobe, cs.length)
          val bd = Array.fill(np)(Double.NegativeInfinity)
          val bc = new Array[Int](np)
          var c = 0
          while (c < cs.length) {
            val cv = cs(c); var s = 0.0; var j = 0
            val n = math.min(v.length, cv.length)
            while (j < n) { s += v(j) * cv(j); j += 1 }
            if (s > bd(np - 1)) {
              var p = np - 1
              while (p > 0 && bd(p - 1) < s) {
                bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
              }
              bd(p) = s; bc(p) = c
            }
            c += 1
          }
          (id, v, bc.toSeq)
        }
      }.toDF("id", "u", "probes")
  }

  /** IVF coarse quantizer: nlist seeds by deterministic hash order, a few
    * Lloyd rounds; the per-(cell, component) mean shuffle is map-side
    * combined, so its volume is nlist * dim, not corpus size. */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    var cents: Array[Array[Double]] = base
      .orderBy(xxhash64(col("id"))).limit(nlist)
      .select("u").collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val means = assignCells(base, bc)
        .select(col("cell"), posexplode(col("u")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell").agg(map_from_arrays(collect_list("pos"), collect_list("m")).as("mm"))
        .collect().map { r =>
          val mm = r.getMap[Int, Double](1)
          r.getInt(0) -> Array.tabulate(mm.size)(i => mm(i))
        }.toMap
      cents = cents.zipWithIndex.map { case (old, c) => means.getOrElse(c, old) }
      bc.destroy()
      it += 1
    }
    cents
  }

  /** IVF search: probe the nprobe best cells per query, exact cosine
    * rerank inside probed cells only. Candidate volume ~ corpus *
    * nprobe / nlist. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 256,
      nprobe: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val cents = trainIvfCentroids(corpus, nlist, iters, idCol, vecCol)
    val bc = spark.sparkContext.broadcast(cents)
    val corp = assignCells(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")), bc)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("u", "cv")
    val q = probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")), bc, nprobe)
      .select(col("id").as("query_id"), col("u").as("qv"),
        explode(col("probes")).as("cell"))
    searchAssigned(corp, q, k)
  }

  private def searchAssigned(corp: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = probes.join(corp, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine",
        aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Persist a trained IVF index: the corpus bucketed by cell (partition
    * pruning turns every later query batch into an nprobe-partition
    * scan) plus the centroid matrix — repeated querying never re-scans
    * or re-trains (the EPT-page / Iceberg-layout shape for vectors). */
  def writeIndex(corpus: DataFrame, path: String, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val cents = trainIvfCentroids(corpus, nlist, iters, idCol, vecCol)
    val bc = spark.sparkContext.broadcast(cents)
    assignCells(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")), bc)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("u", "cv")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    import spark.implicits._
    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Query a persisted index: probed cells become a partition IN-filter
    * on the bucketed corpus. */
  def searchIndex(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val q = probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")), bc, nprobe)
      .select(col("id").as("query_id"), col("u").as("qv"),
        explode(col("probes")).as("cell"))
    val cells = q.select("cell").distinct().collect().map(_.getInt(0))
    val corp = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells.toSeq: _*)) // partition-pruned scan
    searchAssigned(corp, q, k)
  }
}
