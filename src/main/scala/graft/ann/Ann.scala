package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coarse quantizer over an IVF centroid matrix. Flat argmax scan up to
  * `flatLimit` centroids; beyond that a TWO-LEVEL TREE (sqrt(nlist)
  * super-centroids, each owning its nearest centroids) cuts per-vector
  * probe cost from O(nlist*dim) to O((sqrt(nlist)*(1+wsuper))*dim) — at
  * nlist 10^5 that is ~35x less work per corpus vector. Built once on
  * the driver (O(nlist*sqrt(nlist)*dim), seconds at nlist 10^5) and
  * broadcast; unit vectors travel as float (half the shuffle bytes of
  * double), dots accumulate in double. */
final class Coarse private (val cents: Array[Array[Double]],
    superCents: Array[Array[Double]], buckets: Array[Array[Int]])
    extends Serializable {

  def isFlat: Boolean = superCents.length == 0

  @inline private def dotf(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var j = 0; val n = math.min(v.length, c.length)
    while (j < n) { s += v(j) * c(j); j += 1 }
    s
  }

  /** top-k by dot among candidate centroid ids (insertion top-k: k is
    * small). ids == null scans all centroids. */
  private def topk(v: Array[Float], ids: Array[Array[Int]], k: Int): Array[Int] = {
    val total = if (ids == null) cents.length else ids.map(_.length).sum
    val kk = math.min(k, total)
    val bd = Array.fill(kk)(Double.NegativeInfinity)
    val bc = new Array[Int](kk)
    def offer(c: Int): Unit = {
      val s = dotf(v, cents(c))
      if (s > bd(kk - 1)) {
        var p = kk - 1
        while (p > 0 && bd(p - 1) < s) { bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1 }
        bd(p) = s; bc(p) = c
      }
    }
    if (ids == null) { var c = 0; while (c < cents.length) { offer(c); c += 1 } }
    else ids.foreach(b => { var i = 0; while (i < b.length) { offer(b(i)); i += 1 } })
    bc
  }

  /** top-nprobe centroid ids for v; tree mode scans the best
    * max(wsuper, 2*nprobe) super-buckets only. The nprobe-scaled floor is
    * load-bearing for recall: the nprobe nearest CELLS of a query near a
    * cluster boundary scatter across many supers, and a fixed ws=8 of
    * nsuper=64 capped measured recall@10 at ~0.76 no matter how nprobe/m/
    * rerank were raised (BENCH/ivfpq_recall.md) — 2*nprobe restores
    * 0.99 while still scanning O(ws/nsuper) of the cells. Assignment
    * (nprobe=1) keeps the cheap ws=wsuper scan. */
  def probe(v: Array[Float], nprobe: Int, wsuper: Int): Array[Int] = {
    if (isFlat) topk(v, null, nprobe)
    else {
      val ns = superCents.length
      val ws = math.min(math.max(wsuper, 2 * nprobe), ns)
      val sd = Array.fill(ws)(Double.NegativeInfinity)
      val sc = new Array[Int](ws)
      var s = 0
      while (s < ns) {
        val d = dotf(v, superCents(s))
        if (d > sd(ws - 1)) {
          var p = ws - 1
          while (p > 0 && sd(p - 1) < d) { sd(p) = sd(p - 1); sc(p) = sc(p - 1); p -= 1 }
          sd(p) = d; sc(p) = s
        }
        s += 1
      }
      val picked = sc.map(buckets)
      // all selected super-buckets empty (possible when a super's own
      // centroid assigned elsewhere): fall back to the flat scan
      if (picked.forall(_.isEmpty)) topk(v, null, nprobe)
      else topk(v, picked, nprobe)
    }
  }

  def nearest(v: Array[Float], wsuper: Int): Int = probe(v, 1, wsuper)(0)
}

object Coarse {
  /** flatLimit: largest nlist still scanned flat (exact assignment). */
  def build(cents: Array[Array[Double]], flatLimit: Int = 2048): Coarse = {
    val nlist = cents.length
    if (nlist <= flatLimit)
      return new Coarse(cents, Array.empty, Array.empty)
    val nsuper = math.max(2, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    // deterministic stride-sampled super-centroids over the (hash-
    // shuffled, so unbiased) centroid order
    val stride = nlist / nsuper
    val supers = Array.tabulate(nsuper)(i => cents(i * stride))
    val assign = new Array[Int](nlist)
    var c = 0
    while (c < nlist) {
      val v = cents(c)
      var best = 0; var bs = Double.NegativeInfinity
      var s = 0
      while (s < nsuper) {
        val sv = supers(s); var d = 0.0; var j = 0
        val n = math.min(v.length, sv.length)
        while (j < n) { d += v(j) * sv(j); j += 1 }
        if (d > bs) { bs = d; best = s }
        s += 1
      }
      assign(c) = best
      c += 1
    }
    val buckets = Array.fill(nsuper)(new scala.collection.mutable.ArrayBuffer[Int]())
    assign.zipWithIndex.foreach { case (s, i) => buckets(s) += i }
    new Coarse(cents, supers, buckets.map(_.toArray))
  }
}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exactness baseline;
  * IVF is the 100TB scale path: the corpus is pre-partitioned into nlist
  * coarse cells, queries probe only nprobe cells — candidate volume
  * drops by nlist/nprobe while the rerank inside probed cells stays
  * exact.
  *
  * Centroid assignment runs as a tight primitive-array scan over a
  * BROADCAST [[Coarse]] quantizer inside mapPartitions (nlist * dim * 8
  * bytes — nlist 10^5 at dim 100 is ~80 MB, broadcastable); past
  * `flatLimit` centroids the quantizer switches to its two-level tree,
  * so nlist is bounded by broadcast size, not scan cost. Unit vectors
  * are carried as array<float> end-to-end — half the shuffle and index
  * bytes of double — with double accumulation in every dot. */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12))

  /** Exact brute-force cosine top-k — the exactness baseline the
    * approximate paths (ivfTopK / ivfPqTopK) are measured against.
    *
    * Scale shape: the query matrix is collected and BROADCAST (queries
    * are few by contract — this is the per-query-exhaustive baseline,
    * never the bulk path); the corpus is scanned ONCE in a single
    * mapPartitions pass that keeps an insertion top-k per query, so each
    * partition emits at most |queries| * k candidate rows. The final
    * merge windows over numPartitions * |queries| * k rows — never over
    * the corpus. This replaces the round-2 plan (interpreted
    * higher-order-function cosine over a non-equi broadcast join + a
    * full-corpus-per-query window) whose single-partition-per-query
    * funnel could not survive a 100x corpus.
    *
    * Arithmetic matches the Column formulation exactly: elements cast to
    * double, sequential left-to-right accumulation, cosine =
    * dot / max(norm_q * norm_c, 1e-12).
    * @return (query_id, vec_id, cosine, rank) */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s))
      }
    val bq = spark.sparkContext.broadcast(qArr)
    val partials = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bq.value
        val nq = qs.length
        // per-query insertion top-k ordered by (cosine desc, vec_id asc)
        val bs = Array.fill(nq, k)(Double.NegativeInfinity)
        val bi = Array.fill(nq, k)(Long.MaxValue)
        it.foreach { case (vid, v) =>
          var nc = 0.0; var i = 0
          while (i < v.length) { nc += v(i) * v(i); i += 1 }
          val normC = math.sqrt(nc)
          var qi = 0
          while (qi < nq) {
            val (qid, qv, normQ) = qs(qi)
            if (vid != qid) {
              var d = 0.0; var j = 0
              val n = math.min(qv.length, v.length)
              while (j < n) { d += qv(j) * v(j); j += 1 }
              val cos = d / math.max(normQ * normC, 1e-12)
              val s = bs(qi); val ids = bi(qi)
              if (cos > s(k - 1) || (cos == s(k - 1) && vid < ids(k - 1))) {
                var p = k - 1
                while (p > 0 && (s(p - 1) < cos ||
                    (s(p - 1) == cos && ids(p - 1) > vid))) {
                  s(p) = s(p - 1); ids(p) = ids(p - 1); p -= 1
                }
                s(p) = cos; ids(p) = vid
              }
            }
            qi += 1
          }
        }
        qs.indices.iterator.flatMap { qi =>
          (0 until k).iterator
            .filter(j => bs(qi)(j) > Double.NegativeInfinity)
            .map(j => (qs(qi)._1, bi(qi)(j), bs(qi)(j)))
        }
      }.toDF("query_id", "vec_id", "cosine")
    // merge window runs over <= numPartitions * |queries| * k rows
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    partials.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Unit vector as array<float>: 4 bytes/component through every
    * shuffle and the persisted index; dots re-accumulate in double.
    * The norm is bound to a lambda variable so it evaluates ONCE per
    * row — inlined into the per-element lambda it would re-run the
    * full-array aggregate for every component (O(D^2) per vector). */
  private def unitCol(vecCol: String): Column =
    element_at(transform(array(greatest(norm(col(vecCol)), lit(1e-12))),
      nrm => transform(col(vecCol),
        x => (x.cast("double") / nrm).cast("float"))), 1)

  /** (id, unit-vector, nearest cell) via the broadcast quantizer. */
  private def assignCells(df: DataFrame,
      q: org.apache.spark.broadcast.Broadcast[Coarse], wsuper: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("u")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cq = q.value
        it.map { case (id, v) => (id, v, cq.nearest(v, wsuper)) }
      }.toDF("id", "u", "cell")
  }

  /** (id, unit-vector, top-nprobe cells) via the broadcast quantizer. */
  private def probeCells(df: DataFrame,
      q: org.apache.spark.broadcast.Broadcast[Coarse], nprobe: Int,
      wsuper: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("u")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cq = q.value
        it.map { case (id, v) => (id, v, cq.probe(v, nprobe, wsuper).toSeq) }
      }.toDF("id", "u", "probes")
  }

  /** IVF coarse quantizer: nlist seeds by deterministic hash order, a few
    * Lloyd rounds; the per-(cell, component) mean shuffle is map-side
    * combined, so its volume is nlist * dim, not corpus size. */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): Array[Array[Double]] = {
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    trainFromBase(base, nlist, iters, flatLimit, wsuper)
  }

  /** Deterministic hash-ordered sample of `count` unit vectors from a
    * MATERIALIZED (id, u) base. A bare orderBy(hash).limit(count) is a
    * TakeOrdered that ships up to `count` FULL vectors PER PARTITION to
    * the driver (measured: >1 GB and a maxResultSize abort at 64
    * partitions x 16384 x dim 256); pre-filtering to the lowest ~4*count/n
    * hash fraction first bounds the TakeOrdered residue to ~4*count rows
    * total while returning the identical sample (the global hash order
    * is unchanged; the cut keeps every row the limit can select, with a
    * 4x margin so a shortfall is a Chernoff-tail event). */
  private def hashSample(base: DataFrame, count: Int): Array[Array[Float]] = {
    val h = xxhash64(col("id"))
    val n = base.count() // base is persisted by every caller
    val pre =
      if (n > 4L * count) {
        val frac = 4.0 * count / n
        val cut = (Long.MinValue.toDouble + frac * 2.0 * Long.MaxValue.toDouble).toLong
        base.filter(h <= lit(cut))
      } else base
    pre.orderBy(h).limit(count).select("u").collect()
      .map(_.getSeq[Float](0).toArray)
  }

  /** Lloyd rounds over an already-materialized (id, u) base, with
    * OVERSIZED-CELL repair each round. Why: a point-mass slice of the
    * corpus (boilerplate embeddings — e.g. 50% of mass in one tight
    * blob) collapses its seed centroids into near-DUPLICATES as the
    * round-over-round means contract toward the blob center; assignment
    * then routes the whole mass to one tie-winning cell and the
    * cell-cogroup scan gets a straggler task 100x the mean (measured:
    * graft.AnnSkew, max/mean 128 on a 50% blob without repair). A
    * FAISS-style ±eps duplicate perturbation does NOT fix it — the
    * offset is coherent across the near-identical members, so one
    * perturbed copy wins every tie and merely relabels the straggler.
    * The working repair re-seeds deficit cells (empty or starved) with
    * ACTUAL MEMBER VECTORS of oversized cells: members are separated by
    * their own noise, so the next assignment genuinely partitions the
    * mass (the same reason raw-sample seeding at iters = 0 is balanced).
    * Scale shape: the member sample is hash-prefiltered before the
    * per-cell rank window, so the repair job shuffles O(seats * margin)
    * rows, never an oversized cell's full membership. */
  private def trainFromBase(base: DataFrame, nlist: Int, iters: Int,
      flatLimit: Int, wsuper: Int): Array[Array[Double]] = {
    val spark = base.sparkSession
    var cents: Array[Array[Double]] =
      hashSample(base, nlist).map(_.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
      val assigned = assignCells(base, bc, wsuper)
      // per-(cell, pos) count == cell size (each vector contributes one
      // row per dimension), so sizes ride the same aggregation free
      val agg = assigned
        .select(col("cell"), posexplode(col("u")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"), count(lit(1)).as("c"))
        .groupBy("cell").agg(
          map_from_arrays(collect_list("pos"), collect_list("m")).as("mm"),
          max("c").as("sz"))
        .collect().map { r =>
          val mm = r.getMap[Int, Double](1)
          r.getInt(0) -> (Array.tabulate(mm.size)(i => mm(i)), r.getLong(2))
        }.toMap
      val sizes = Array.tabulate(nlist)(c => agg.get(c).map(_._2).getOrElse(0L))
      // SPHERICAL k-means: centroids re-normalize after every mean
      // update. Assignment is argmax DOT — with raw means the norm
      // varies with cluster tightness (a tight cell's mean has norm ~1,
      // a wide cell's ~0.4), which biases every tie toward tight cells
      // and is the engine of the point-mass collapse graft.AnnSkew
      // measures; unit centroids make argmax dot == argmax cosine,
      // consistent with the cosine search the cells serve.
      def unit(v: Array[Double]): Array[Double] = {
        val nrm = math.sqrt(v.map(x => x * x).sum)
        if (nrm > 1e-12) v.map(_ / nrm) else v
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        agg.get(c).map(m => unit(m._1)).getOrElse(old)
      }
      val n = sizes.sum
      val mean = math.max(n.toDouble / nlist, 1.0)
      // donors: cells past 8x the mean (the collapse signature — natural
      // k-means imbalance stays well under it); each asks for enough
      // fresh seeds to bring it near 2x. Deficits: ONLY empty or starved
      // (< mean/16) cells — re-seeding a healthy small cell would orphan
      // its real members onto neighbors and ADD skew (measured: a 4x
      // trigger stealing smallest-cells pushed round-1 ratio 7 -> 27).
      val donors = (0 until nlist).filter(sizes(_) > 8 * mean)
        .map(d => d -> (math.ceil(sizes(d) / (2 * mean)).toInt - 1))
        .filter(_._2 > 0)
      if (donors.nonEmpty) {
        val want = donors.map(_._2).sum
        val deficits = (0 until nlist).filterNot(donors.map(_._1).toSet)
          .filter(sizes(_) < mean / 16).sortBy(sizes(_)).take(want)
        if (deficits.nonEmpty) {
          val donorIds = donors.map(_._1)
          val seatDf = spark.createDataFrame(donors).toDF("cell", "__seats")
          // hash-prefilter (64x margin) bounds the rank window's input
          // per donor cell; the window then picks the lowest-hash seats
          val maxFrac = donors.map { case (d, s) =>
            math.min(1.0, 64.0 * s / math.max(sizes(d), 1L)) }.max
          val cut = (Long.MinValue.toDouble +
            maxFrac * 2.0 * Long.MaxValue.toDouble).toLong
          val seeds = assigned.filter(col("cell").isin(donorIds: _*))
            .withColumn("__h", xxhash64(col("id")))
            .filter(col("__h") <= lit(cut))
            .join(broadcast(seatDf), Seq("cell"))
            .withColumn("__rn", row_number().over(
              Window.partitionBy("cell").orderBy("__h")))
            .filter(col("__rn") <= col("__seats"))
            .select("cell", "u").collect()
            .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
          deficits.zip(seeds).foreach { case (slot, v) => cents(slot) = v }
        }
      }
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
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    // ONE materialized (id, unit) base feeds training AND the assignment
    // pass — re-deriving it from the raw corpus would re-execute the
    // caller's upstream plan and re-normalize every vector
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    val cents = trainFromBase(base, nlist, iters, flatLimit, wsuper)
    val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
    val corp = assignCells(base, bc, wsuper)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("u", "cv")
    val q = probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")),
      bc, nprobe, wsuper)
      .select(col("id").as("query_id"), col("u").as("qv"),
        explode(col("probes")).as("cell"))
    searchAssigned(corp, q, k)
  }

  /** IVF-PQ search: the memory-bound scale path. Corpus vectors live in
    * their IVF cell as m-byte PQ codes (not D floats); each (query,
    * probed cell) pair builds one ADC lookup table and scans the cell's
    * codes at O(m) per candidate; the ADC top-`rerank` then rerank
    * EXACTLY against the full float vectors, so the output contract is
    * identical to [[ivfTopK]] minus candidates the code scan mis-ranks
    * out of the top-rerank (bounded by the recall spec).
    *
    * Scan stage is a cell cogroup like the kNN halo join: per-cell task
    * cost is O(|cell| * queriesProbing * m) and shuffles codes (m bytes/
    * vector), not vectors — at dim 768 / m 16 the scanned bytes drop
    * 192x, which is the difference between a 10^12-vector probe fitting
    * in cluster memory or not. Dense-cell skew: one cell = one task, same
    * mitigation as kNN (cells come from k-means, which splits dense
    * regions into many cells by construction; cap nprobe-side fan-in by
    * raising nlist). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 256, nprobe: Int = 16, m: Int = 8, ksub: Int = 256,
      rerank: Int = 100, iters: Int = 3, pqSample: Int = 16384,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    val cents = trainFromBase(base, nlist, iters, flatLimit, wsuper)
    val coarse = Coarse.build(cents, flatLimit)
    val bc = spark.sparkContext.broadcast(coarse)
    // IVFADC (Jegou et al. 2011 §IV): the PQ quantizes the RESIDUAL
    // v - centroid(cell), not v — the residual's variance is ~1/nlist of
    // the vector's, so the same m bytes carry far more of the distance
    // signal. Measured on the 1M/dim-256 AnnRecall mixture: raw-vector
    // codes capped recall@10 at 0.84 (m=32, rerank=200) no matter how
    // nlist/nprobe were raised; residual codes lift the same settings
    // past it (BENCH/ivfpq_recall.md). Codebooks train on the residuals
    // of a deterministic hash-ordered sample.
    val sample = hashSample(base, pqSample)
      .map(v => residual(v, cents(coarse.nearest(v, wsuper))))
    val bpq = spark.sparkContext.broadcast(Pq.train(sample, m, ksub))
    // assign + residual-encode in ONE pass: (id, cell, m-byte code)
    val codes = base.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cq = bc.value; val pq = bpq.value
        it.map { case (id, v) =>
          val cell = cq.nearest(v, wsuper)
          (id, cell, pq.encode(residual(v, cq.cents(cell))))
        }
      }
    val probes = probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")),
      bc, nprobe, wsuper)
      .select(col("id"), col("u"), explode(col("probes")).as("cell"))
      .as[(Long, Array[Float], Int)]
    val top = adcTopRerank(probes, codes, bpq, bc, rerank)
    exactRerank(top,
      base.select(col("id").as("vec_id"), col("u").as("cv")),
      queries.select(col(idCol).cast("long").as("query_id"),
        unitCol(vecCol).as("qv")), k)
  }

  /** v - c componentwise, as float (deterministic: double subtract,
    * one rounding). Encode and training MUST share this exact form. */
  private def residual(v: Array[Float], c: Array[Double]): Array[Float] = {
    val r = new Array[Float](v.length)
    var j = 0
    while (j < v.length) { r(j) = (v(j) - c(j)).toFloat; j += 1 }
    r
  }

  /** Per-cell ADC scan (one LUT per (query, cell), insertion top-rerank
    * per pair) + the global ADC top-rerank window. Codes are RESIDUAL
    * codes, so a candidate's approximate score is
    * <q, centroid(cell)> + <q, residual-decode(code)> — the first term is
    * one dot per (query, cell), the second is the O(m) ADC table sum.
    * Within a cell the centroid term is constant, but the global
    * top-rerank window compares across cells, so it must ride on every
    * score.
    * @return (query_id, vec_id) — the exact-rerank candidate set */
  private def adcTopRerank(
      probes: org.apache.spark.sql.Dataset[(Long, Array[Float], Int)],
      codes: org.apache.spark.sql.Dataset[(Long, Int, Array[Byte])],
      bpq: org.apache.spark.broadcast.Broadcast[Pq],
      bc: org.apache.spark.broadcast.Broadcast[Coarse],
      rerank: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cand = probes.groupByKey(_._3).cogroup(codes.groupByKey(_._2)) {
      (cell, qs, cs) =>
        val cArr = cs.toArray
        if (cArr.isEmpty) Iterator.empty
        else qs.flatMap { case (qid, qv, _) =>
          val pq = bpq.value
          val lut = pq.lut(qv)
          val cent = bc.value.cents(cell)
          var qc = 0.0
          var j = 0
          while (j < qv.length) { qc += qv(j) * cent(j); j += 1 }
          val qcF = qc.toFloat
          val r = math.min(rerank, cArr.length)
          val bs = Array.fill(r)(Float.NegativeInfinity)
          val bi = new Array[Long](r)
          var i = 0
          while (i < cArr.length) {
            val (vid, _, code) = cArr(i)
            if (vid != qid) {
              val s = qcF + pq.adc(lut, code)
              // adc desc, id asc: deterministic under float ties
              if (s > bs(r - 1) || (s == bs(r - 1) && vid < bi(r - 1))) {
                var p = r - 1
                while (p > 0 && (bs(p - 1) < s || (bs(p - 1) == s && bi(p - 1) > vid))) {
                  bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
                }
                bs(p) = s; bi(p) = vid
              }
            }
            i += 1
          }
          (0 until r).iterator.filter(bs(_) > Float.NegativeInfinity)
            .map(j => (qid, bi(j), bs(j)))
        }
    }.toDF("query_id", "vec_id", "adc")
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    cand.withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= rerank).select("query_id", "vec_id")
  }

  /** Exact cosine rerank of an ADC candidate set against the full float
    * vectors; output contract matches [[bruteForceTopK]]. */
  private def exactRerank(top: DataFrame, vectors: DataFrame,
      queriesUnit: DataFrame, k: Int): DataFrame = {
    val scored = top
      .join(vectors, Seq("vec_id"))
      .join(broadcast(queriesUnit), Seq("query_id"))
      .withColumn("cosine",
        aggregate(zip_with(col("qv"), col("cv"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  private def searchAssigned(corp: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = probes.join(corp, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine",
        aggregate(zip_with(col("qv"), col("cv"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Persist a trained IVF index: the corpus bucketed by cell (partition
    * pruning turns every later query batch into an nprobe-partition
    * scan) plus the centroid matrix — repeated querying never re-scans
    * or re-trains (the EPT-page / Iceberg-layout shape for vectors).
    * Unit vectors land as array<float>: half the index bytes. */
  def writeIndex(corpus: DataFrame, path: String, nlist: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): Unit = {
    val spark = corpus.sparkSession
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    val cents = trainFromBase(base, nlist, iters, flatLimit, wsuper)
    val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
    assignCells(base, bc, wsuper)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("u", "cv")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    import spark.implicits._
    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incremental index maintenance: assign a DELTA of new vectors to the
    * EXISTING centroids and APPEND them to the cell-partitioned corpus —
    * no retrain, no rewrite of existing cells (the Iceberg-append shape
    * over the index layout; at 100 TB an index rebuild per ingest batch
    * is the thing this exists to avoid). Returns the post-append skew
    * ratio (max occupied cell / mean occupied cell — the statistic the
    * AnnSkew study bounds at 8x for the trainer), which is the drift
    * signal: appends quantized by stale centroids concentrate when the
    * data distribution moves. */
  def appendToIndex(delta: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): Double = {
    val spark = delta.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
    val base = graft.core.Mat(
      delta.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    assignCells(base, bc, wsuper)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("u", "cv")
      .write.mode("append").partitionBy("cell").parquet(s"$path/corpus")
    indexSkew(spark, path)
  }

  /** max/mean occupied-cell ratio of a persisted index's corpus. */
  def indexSkew(spark: SparkSession, path: String): Double = {
    val r = spark.read.parquet(s"$path/corpus").groupBy("cell").count()
      .agg(max("count").as("mx"), avg("count").as("mean")).head()
    if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble / r.getDouble(1)
  }

  /** Table-driven index maintenance: consume the snapshot table's delta
    * since the last checkpoint (GraftTable.processDelta — exactly the
    * appended rows), append it to the index, and REBUILD (full spherical
    * k-means retrain with member re-seeding) only when drift pushes the
    * skew ratio past `maxSkew` — the bound the trainer itself certifies
    * in the AnnSkew study, so post-rebuild skew returns under it by the
    * measured 50%-point-mass margin. Returns (rows appended, skew after
    * maintenance, rebuilt?).
    *
    * Crash contract: the checkpoint advances only after the append
    * lands, so a crash between them replays the delta — appends are
    * at-least-once and a replay duplicates rows in the index corpus
    * (never loses them). A rebuild rewrites the corpus from the TABLE
    * (deduplicated by construction), so the periodic drift rebuild is
    * also the repair path; readers needing exactness meanwhile can
    * dropDuplicates("vec_id"). */
  def maintainIndex(spark: SparkSession, tableRoot: String,
      checkpointFile: String, indexPath: String, nlist: Int,
      iters: Int = 3, maxSkew: Double = 8.0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): (Long, Double, Boolean) = {
    var appended = 0L
    graft.sources.GraftTable.processDelta(spark, tableRoot, checkpointFile) {
      (delta, _, _) =>
        val d = graft.core.Mat(delta.select(col(idCol), col(vecCol)))
        appended = d.count()
        if (appended > 0)
          appendToIndex(d, indexPath, idCol, vecCol, flatLimit, wsuper)
    }
    val skew = indexSkew(spark, indexPath)
    if (skew > maxSkew) {
      writeIndex(
        graft.sources.GraftTable.read(spark, tableRoot).select(idCol, vecCol),
        indexPath, nlist, iters, idCol, vecCol, flatLimit, wsuper)
      (appended, indexSkew(spark, indexPath), true)
    } else (appended, skew, false)
  }

  /** Query a persisted index: probed cells become a partition IN-filter
    * on the bucketed corpus. */
  def searchIndex(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
    // materialized: the cell collect below AND searchAssigned both read
    // it — unmaterialized, the probe pass would execute twice
    val q = graft.core.Mat(probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")),
      bc, nprobe, wsuper)
      .select(col("id").as("query_id"), col("u").as("qv"),
        explode(col("probes")).as("cell")))
    val cells = q.select("cell").distinct().collect().map(_.getInt(0))
    val corp = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells.toSeq: _*)) // partition-pruned scan
    searchAssigned(corp, q, k)
  }

  /** Persist an IVF-PQ index: one cell-partitioned table holding BOTH the
    * m-byte code and the full float vector per row. Parquet is columnar,
    * so the ADC scan reads only (vec_id, code) — the compressed index —
    * while the exact rerank re-reads (vec_id, u) for just the top-R
    * candidates; partition pruning on `cell` bounds both reads to the
    * probed cells. Codebooks and centroids persist beside it, so repeated
    * query batches never re-train or re-encode. */
  def writePqIndex(corpus: DataFrame, path: String, nlist: Int,
      m: Int = 8, ksub: Int = 256, iters: Int = 3, pqSample: Int = 16384,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = graft.core.Mat(
      corpus.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")))
    val cents = trainFromBase(base, nlist, iters, flatLimit, wsuper)
    val coarse = Coarse.build(cents, flatLimit)
    val bc = spark.sparkContext.broadcast(coarse)
    // residual codes (IVFADC) — searchPqIndex adds <q, centroid> back
    val sample = hashSample(base, pqSample)
      .map(v => residual(v, cents(coarse.nearest(v, wsuper))))
    val pq = Pq.train(sample, m, ksub)
    val bpq = spark.sparkContext.broadcast(pq)
    base.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cq = bc.value; val p = bpq.value
        it.map { case (id, v) =>
          val cell = cq.nearest(v, wsuper)
          (id, v, p.encode(residual(v, cq.cents(cell))), cell)
        }
      }.toDF("vec_id", "u", "code", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    pq.books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
    }.toSeq.toDF("sub", "cent", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // format marker: codes are RESIDUAL (IVFADC) since the round-3
    // encoding change; searchPqIndex adds <q, centroid> back and would
    // silently mis-rank a raw-code index, so the reader refuses any
    // index that does not declare this format
    Seq((pqIndexFormat, m)).toDF("format", "m")
      .repartition(1).write.mode("overwrite").parquet(s"$path/format")
  }

  private val pqIndexFormat = "ivfadc-residual-v2"

  /** Query a persisted IVF-PQ index: probed cells -> partition-pruned
    * column-pruned code scan -> ADC top-rerank -> exact rerank against
    * the float vectors of the candidates only. */
  def searchPqIndex(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 16, rerank: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding",
      flatLimit: Int = 2048, wsuper: Int = 8): DataFrame = {
    import spark.implicits._
    val fmt = scala.util.Try(spark.read.parquet(s"$path/format")
      .select("format").head().getString(0)).getOrElse("<missing>")
    require(fmt == pqIndexFormat,
      s"PQ index at $path declares format '$fmt' but this reader needs " +
      s"'$pqIndexFormat' (residual/IVFADC codes) — rebuild the index with " +
      "writePqIndex; scoring raw codes as residuals would silently mis-rank")
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast(Coarse.build(cents, flatLimit))
    val bookRows = spark.read.parquet(s"$path/codebooks")
      .orderBy("sub", "cent").collect()
    val mSub = bookRows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(mSub)(s =>
      bookRows.filter(_.getInt(0) == s).map(_.getSeq[Float](2).toArray))
    val bpq = spark.sparkContext.broadcast(Pq.fromBooks(books))
    // materialized: read by the cell collect AND the ADC cogroup
    val probes = graft.core.Mat(probeCells(
      queries.select(col(idCol).cast("long").as("id"), unitCol(vecCol).as("u")),
      bc, nprobe, wsuper)
      .select(col("id"), col("u"), explode(col("probes")).as("cell")))
      .as[(Long, Array[Float], Int)]
    val cells = probes.map(_._3).distinct().collect()
    val pruned = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells.toSeq: _*)) // partition-pruned
    // column-pruned: this projection never reads the `u` column bytes
    val codes = pruned.select(col("vec_id"), col("cell"), col("code"))
      .as[(Long, Int, Array[Byte])]
    val top = adcTopRerank(probes, codes, bpq, bc, rerank)
    exactRerank(top, pruned.select(col("vec_id"), col("u").as("cv")),
      queries.select(col(idCol).cast("long").as("query_id"),
        unitCol(vecCol).as("qv")), k)
  }
}
