package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exactness baseline;
  * the IVF variant is the 100TB scale path: corpus pre-partitioned into
  * coarse cells (spherical k-means-lite), queries probe only nprobe
  * cells — candidate volume drops by cells/nprobe while the final rerank
  * stays exact over the probed subset. */
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

  /** IVF coarse quantizer: nlist centroids via deterministic seeded
    * sampling + a few Lloyd rounds on the unit sphere; returns the
    * centroid table (cell, centroid array). */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Int, Array[Double])] = {
    val unitV = transform(col(vecCol), x =>
      x.cast("double") / greatest(norm(col(vecCol)), lit(1e-12)))
    val base = corpus.select(col(idCol).as("id"), unitV.as("u")).cache()
    var cents = base.orderBy(xxhash64(col("id"))).limit(nlist)
      .select("u").collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex.map(_.swap)
    var it = 0
    while (it < iters) {
      val assigned = base.withColumn("cell", assignCell(col("u"), cents))
      // mean per (cell, pos)
      val means = assigned.select(col("cell"), posexplode(col("u")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell").agg(map_from_arrays(collect_list("pos"), collect_list("m")).as("mm"))
        .collect().map { r =>
          val mm = r.getMap[Int, Double](1)
          r.getInt(0) -> Array.tabulate(mm.size)(i => mm(i))
        }.toMap
      cents = cents.map { case (c, old) => c -> means.getOrElse(c, old) }
      it += 1
    }
    base.unpersist()
    cents
  }

  /** Cell assignment: argmax centroid dot product (pure columns over a
    * literal centroid table — broadcast by construction). */
  private def assignCell(u: Column, cents: Array[(Int, Array[Double])]): Column = {
    val scored = cents.map { case (c, v) =>
      val cv = array(v.map(lit): _*)
      struct(dot(u, cv).as("s"), lit(c).as("c"))
    }
    array_max(array(scored: _*)).getField("c")
  }

  /** IVF search: probe the `nprobe` best cells per query, exact cosine
    * rerank inside probed cells only. Recall < 1 by design; candidate
    * volume ~ corpus * nprobe / nlist. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = trainIvfCentroids(corpus, nlist, idCol = idCol, vecCol = vecCol)
    val unitV = transform(col(vecCol), x =>
      x.cast("double") / greatest(norm(col(vecCol)), lit(1e-12)))
    val corp = corpus.select(col(idCol).as("vec_id"), unitV.as("cv"))
      .withColumn("cell", assignCell(col("cv"), cents))
    // query -> top nprobe cells
    val scoredCells = cents.map { case (c, v) =>
      val cv = array(v.map(lit): _*)
      struct(dot(col("qv"), cv).as("s"), lit(c).as("c"))
    }
    val q = queries.select(col(idCol).as("query_id"), unitV.as("qv"))
      .withColumn("probe", slice(reverse(array_sort(array(scoredCells: _*))), 1, nprobe))
      .withColumn("cell", explode(transform(col("probe"), p => p.getField("c"))))
      .select("query_id", "qv", "cell")
    val scored = q.join(corp, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }
}
