package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines over a documents
  * table (id column + text column). All candidate generation is
  * bucket-partitioned (LSH band join / hash groupBy) — never an O(n^2)
  * cross join — so every variant scales linearly in shuffle volume.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on the normalized-text fingerprint; keeps
    * the lowest id per group (one shuffle on a 8-byte key). */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val keep = fp.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    fp.join(keep, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  /** MinHash signature: each shingle STRING is hashed once; the
    * numHashes "permutations" derive from that 8-byte base hash with a
    * seeded long-hash (the standard one-strong-hash + k-derived family)
    * — hashing a long is a single block vs 4+ for the string, so the
    * per-row work drops ~4x vs re-hashing strings per seed. The base
    * array is bound to a lambda variable so it is built once per row
    * (CollapseProject cannot inline into a lambda-variable reference). */
  def minhashSignature(textCol: Column, numHashes: Int = 64, shingle: Int = 3): Column =
    element_at(transform(
      array(array_distinct(transform(TextAnalysis.wordShingles(textCol, shingle),
        s => xxhash64(s)))),
      hs => transform(sequence(lit(0), lit(numHashes - 1)),
        seed => array_min(transform(hs, h => xxhash64(seed, h))))), 1)

  /** S-curve banding: pick the band count (a divisor of numHashes) whose
    * collision threshold (1/b)^(1/r) sits closest to the requested
    * similarity threshold. */
  def autoBands(numHashes: Int, threshold: Double): Int =
    (1 to numHashes).filter(numHashes % _ == 0).minBy { b =>
      val r = numHashes / b
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }

  /** MinHash + LSH near-dup pairs: signatures banded into `bands`
    * buckets (bands <= 0 -> auto-picked from the threshold S-curve);
    * same-bucket docs become candidates; candidates verified by
    * estimated Jaccard (matching minhash fraction) >= threshold.
    * Returns (id_a, id_b, jaccard_est) with id_a < id_b.
    *
    * Degenerate mega-buckets (empty/boilerplate docs hashing to one
    * bucket) would make the self-join quadratic: buckets larger than
    * `maxBucket` are EXCLUDED from candidate generation — their members
    * are near-identical boilerplate that exact dedup already collapses.
    * This is a documented recall cap, not a silent one: pairs inside a
    * dropped bucket are only missed if they share no other bucket.
    *
    * maxBucket bounds the aggregation BUFFER, not the pair OUTPUT: a
    * bucket just under the cap still expands ~maxBucket^2/2 candidate
    * pairs inside one task. The default (1e5 -> ~5e9 pairs worst case)
    * favors recall; pipelines that need a bounded per-task pair count
    * should pass a smaller cap (1000 -> <=0.5M pairs per bucket).
    * Ids must be unique — duplicate ids in the input would pair with
    * themselves inside a shared bucket (guarded by an id_a != id_b
    * filter, which also hides one real pair per duplicated id). */
  def minhashLsh(df: DataFrame, threshold: Double = 0.7, numHashes: Int = 64,
      bands: Int = 0, idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = 100000): DataFrame = {
    val b = if (bands > 0) bands else autoBands(numHashes, threshold)
    require(numHashes % b == 0,
      s"bands ($b) must divide numHashes ($numHashes): a remainder would " +
        "silently drop the tail hashes from banding (autoBands only " +
        "returns divisors)")
    val rows = numHashes / b
    // Codegen'd one-pass signature (strings hashed once, permutations
    // derived from the 8-byte base hash) — bit-identical to the column
    // formulation minhashSignature, which stays as the executable spec
    // it is equivalence-tested against. No intermediate shingle table is
    // materialized at all.
    val sig = df.select(col(idCol).as("id"),
        graft.functions.F.minhashSig(col(textCol), numHashes, 3).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE materialization of the signature cache before the downstream
    // plan scans it at three points (banding + the two verify joins) —
    // concurrent first-scans would each re-hash the shingles.
    sig.count()
    val banded = sig.withColumn("band", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("bucket", xxhash64(col("band"),
        slice(col("sig"), col("band") * rows + 1, lit(rows))))
      .select("id", "band", "bucket")
    // Candidate pairs straight from ONE (band, bucket) aggregation: the
    // sorted member list of each bucket expands to its i<j pairs in
    // place. Replaces the round-2 shape (hot-bucket count + collect +
    // broadcast anti-join + two-sided self-join shuffle, ~6 fixed jobs
    // per call) with a single shuffle; the mega-bucket cap becomes a
    // plain size filter with identical semantics (members of a bucket
    // larger than maxBucket generate no pairs from that bucket).
    // cappedCollectList bounds the aggregation buffer at maxBucket + 1
    // elements per group, so a degenerate bucket holding a large slice
    // of the corpus never materializes an unbounded list on an executor
    // — it arrives as exactly maxBucket + 1 ids and the size filter
    // drops it, same semantics as an uncapped collect + filter.
    val cand = banded.groupBy("band", "bucket")
      .agg(sort_array(graft.functions.F.cappedCollectList(
        col("id"), maxBucket)).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      // duplicate input ids sort adjacent and would self-pair here (the
      // old self-join's a.id < b.id excluded them); keep that contract
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    val withSigs = cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
    // materialize the (small) verified pair set, then release the
    // signature cache — returning it lazily would pin the cached blocks
    // for the session (the caller has no handle to free them)
    val out = graft.core.Mat(withSigs.withColumn("jaccard_est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("double") / numHashes)
      .filter(col("jaccard_est") >= threshold)
      .select("id_a", "id_b", "jaccard_est"))
    sig.unpersist(false)
    out
  }

  /** Near-dup removal built on minhashLsh: drop the higher id of every
    * matched pair (transitive chains collapse to the smallest id via the
    * standard keep-if-never-the-larger rule). */
  def minhashDedup(df: DataFrame, threshold: Double = 0.7,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dupIds = minhashLsh(df, threshold, idCol = idCol, textCol = textCol)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Transitive dup-GROUP resolution over a near-dup pair set: connected
    * components of the pair graph, each doc labeled with the MIN doc id
    * of its component (`groupCol`), canonical = (id == group). This is
    * the end state a training pipeline actually consumes — pairwise
    * drop-the-larger (minhashDedup) keeps BOTH survivors of a
    * star-shaped component {5,6,7} with pairs (5,7),(6,7) only, while
    * the component rule collapses it to one. Ids must be long-valued
    * (the documents table's doc_id is). Runs on the shared Components
    * machinery: driver union-find when the pair set fits (near-dup pair
    * sets are tiny next to the corpus), distributed min-label
    * propagation with pointer jumping past the edge limit — never a
    * driver-side transitive closure over the corpus. */
  def resolveComponents(df: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", groupCol: String = "dup_group"): DataFrame =
    resolveComponents(df, pairs, idCol, groupCol,
      graft.operators.Components.localEdgeLimit)

  /** edgeLimit-pinned variant (0 = distributed label propagation) so the
    * fast==distributed differential is testable like Cluster's. */
  private[graft] def resolveComponents(df: DataFrame, pairs: DataFrame,
      idCol: String, groupCol: String, edgeLimit: Long): DataFrame = {
    val p = pairs.columns
    val (labels, small) = graft.operators.Components.minLabels(
      pairs.select(col(p(0)), col(p(1))), edgeLimit)
    val lbl = labels.select(col("k").as(idCol), col("lbl").as("__grp"))
    df.join(if (small) broadcast(lbl) else lbl, Seq(idCol), "left")
      .withColumn(groupCol, coalesce(col("__grp"), col(idCol).cast("long")))
      .drop("__grp")
  }

  /** Corpus after component resolution: exactly one canonical doc (the
    * min id) survives per connected near-dup component. */
  def dedupCanonical(df: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    resolveComponents(df, pairs, idCol, "__dg")
      .filter(col("__dg") === col(idCol).cast("long")).drop("__dg")

  /** 64-bit SimHash fingerprint of the token stream — per-bit vote sums
    * folded into a long. Column-valued shift amounts need the SQL surface
    * (the Scala `shiftright` helper only takes Int), so this is one SQL
    * higher-order expression over a named input column. */
  def simhashSql(textColName: String): Column = expr(
    s"""aggregate(
         zip_with(
           aggregate(
             split(trim(lower($textColName)), '\\\\s+'),
             array_repeat(0L, 64),
             (acc, w) -> zip_with(acc, sequence(0, 63),
               (a, i) -> a + IF((shiftrightunsigned(xxhash64(w), CAST(i AS INT)) & 1) = 1, 1L, -1L))),
           sequence(0, 63),
           (v, i) -> IF(v > 0, shiftleft(1L, CAST(i AS INT)), 0L)),
         0L, (acc, b) -> acc | b)""")

  /** SimHash near-dup pairs: fingerprints bucketed by maxHamming+1
    * disjoint bit chunks — pigeonhole guarantees any pair within hamming
    * distance <= maxHamming shares at least one untouched chunk, so
    * candidate recall is 1.0 AT the requested radius. Verified with
    * bit_count(xor) <= maxHamming.
    *
    * maxHamming is capped at 7 (8 chunks of >= 8 bits): beyond that the
    * chunks get so narrow that bucket collision volume goes quadratic —
    * larger radii need multi-probe or multi-table indexes, not narrower
    * chunks. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = 100000): DataFrame = {
    // codegen'd fingerprint (one tight loop per row); bit-identical to
    // simhashSql, which stays as the executable spec it is tested against
    val fp = graft.core.Mat(
      df.select(col(idCol).as("id"),
        graft.functions.F.simhash64(col(textCol)).as("fp")))
    simhashPairsFromFp(fp, maxHamming, maxBucket)
  }

  /** Pair generation over precomputed (id, fp) fingerprints — split out
    * so bucket recall is testable on crafted fingerprints.
    *
    * Candidates come from ONE capped (chunk-key) aggregation — the same
    * shape minhashLsh uses — never a chunk-key self-join: a degenerate
    * corpus slice (empty/boilerplate docs all fingerprinting to 0L) puts
    * millions of ids in one bucket, and a self-join would materialize
    * all O(n^2) pairs. cappedCollectList bounds the aggregation buffer at
    * maxBucket + 1 ids per bucket at ANY skew; buckets over the cap
    * generate no pairs (documented recall cap — their members are
    * near-identical boilerplate that exact dedup already collapses; a
    * pair inside a dropped bucket is only missed if all its other
    * chunk buckets are also over the cap). */
  def simhashPairsFromFp(fp: DataFrame, maxHamming: Int,
      maxBucket: Int = 100000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"chunk-bucket recall guarantee needs maxHamming+1 <= 8 chunks of >= 8 bits " +
        s"(got $maxHamming); use simhashPairsMultiProbe for larger radii")
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    val c = maxHamming + 1
    val base = 64 / c
    val rem = 64 % c
    val widths = Array.tabulate(c)(i => if (i < rem) base + 1 else base)
    val shifts = widths.scanLeft(0)(_ + _).take(c)
    val chunkDefs = array(shifts.indices.map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1
      struct(lit(i).as("i"), lit(shifts(i)).as("sh"), lit(mask).as("mask"))
    }: _*)
    val chunked = fp.withColumn("__c", explode(chunkDefs))
      .withColumn("key", struct(col("__c.i"),
        expr("shiftrightunsigned(fp, CAST(__c.sh AS INT))").bitwiseAND(col("__c.mask"))))
      .select(struct(col("id"), col("fp")).as("m"), col("key"))
    // sorted member list per bucket expands to its i<j pairs in place;
    // members carry (id, fp) structs through the aggregation, so the
    // hamming verification needs NO re-attach join (the 16-byte payload
    // rides the one shuffle this path has) — sort_array orders structs
    // by their first field, which keeps the i<j expansion on id order
    val cand = chunked.groupBy("key")
      .agg(sort_array(graft.functions.F.cappedCollectList(
        col("m"), maxBucket)).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
      .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("b"))
    cand
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      // duplicate input ids sort adjacent and would self-pair at
      // hamming 0 (the pre-r4 self-join's a.id < b.id excluded them)
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .select("id_a", "id_b", "hamming")
  }

  /** Multi-probe SimHash pair generation for radii the chunk pigeonhole
    * cannot reach (maxHamming > 7 would need chunks narrower than 8
    * bits, whose bucket collision volume goes quadratic). Instead of
    * narrower chunks, each of `chunks` WIDE chunks is probed with every
    * 0- and 1-bit flip of itself — symmetric probing, so two
    * fingerprints share a probe key for a chunk iff their distance
    * WITHIN that chunk is <= 2 (a's variant set and b's variant set
    * intersect exactly when d(a_c, b_c) <= 2e with e = 1).
    *
    * Recall: hamming(a, b) <= maxHamming means some chunk carries
    * <= floor(maxHamming/chunks) of the flips (pigeonhole), so
    * requiring floor(maxHamming/chunks) <= 2 makes candidate recall 1.0
    * AT the radius — chunks=4 covers radii up to 11, chunks=8 up to 23.
    * Cost: (width+1) probe keys per chunk per doc (e.g. 68 for
    * chunks=4), all through the same capped aggregation as the exact
    * path, so degenerate buckets stay bounded at any skew; the wider
    * radius also widens bucket population (a 16-bit chunk has 2^16
    * buckets), which maxBucket caps with the documented recall trade. */
  def simhashPairsMultiProbe(fp: DataFrame, maxHamming: Int,
      chunks: Int = 4, maxBucket: Int = 100000): DataFrame = {
    require(chunks >= 2 && chunks <= 16 && 64 % chunks == 0,
      s"chunks must divide 64 (got $chunks)")
    require(maxHamming >= 0 && maxHamming / chunks <= 2,
      s"1-bit symmetric probing covers per-chunk distance <= 2, so " +
        s"maxHamming/chunks must be <= 2 (got $maxHamming/$chunks = " +
        s"${maxHamming / chunks}); raise chunks")
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    val width = 64 / chunks
    val shifts = Array.tabulate(chunks)(_ * width)
    val mask = if (width == 64) -1L else (1L << width) - 1
    val chunkDefs = array(shifts.indices.map { i =>
      struct(lit(i).as("i"), lit(shifts(i)).as("sh"))
    }: _*)
    // flip position -1 = the exact chunk value; 0..width-1 = 1-bit flips
    val flips = array((-1 until width).map(b => lit(b)): _*)
    val probed = fp.withColumn("__c", explode(chunkDefs))
      .withColumn("__v",
        expr("shiftrightunsigned(fp, CAST(__c.sh AS INT))")
          .bitwiseAND(lit(mask)))
      .withColumn("__b", explode(flips))
      .withColumn("key", struct(col("__c.i"),
        when(col("__b") < 0, col("__v")).otherwise(
          col("__v").bitwiseXOR(expr("shiftleft(1L, CAST(__b AS INT))")))))
      .select(struct(col("id"), col("fp")).as("m"), col("key"))
    val cand = probed.groupBy("key")
      .agg(sort_array(graft.functions.F.cappedCollectList(
        col("m"), maxBucket)).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
      .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("b"))
    cand
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard for candidate pairs from LSH (verification
    * path): true set Jaccard over word shingles. */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(col(textCol), n)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)))
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding cosine near-dup pairs: seeded random-hyperplane LSH over a
    * vector column, MULTI-BAND (OR-of-ANDs like minhash banding) bucket
    * join, exact cosine verification.
    *
    * Recall for a pair at angle theta: 1 - (1 - (1-theta/pi)^planesPerBand)
    * ^ bands. Defaults (8 planes x 6 bands) give ~0.96 recall at cosine
    * 0.95 — the single-band version's ~0.28 recall hole. Candidate
    * volume stays linear: per band, same-bucket pairs only.
    *
    * Candidate ids come from the SAME capped (band, bucket) aggregation
    * minhashLsh and simhashPairsFromFp use — never a bucket self-join: a
    * degenerate corpus slice whose embeddings coincide (zero vectors from
    * empty docs, boilerplate embeddings) puts millions of ids in one
    * bucket across every band, and a self-join would materialize all
    * O(n^2) pairs 6 times over. cappedCollectList bounds the buffer at
    * maxBucket + 1 ids at ANY skew; over-cap buckets generate no pairs
    * (documented recall cap — coincident embeddings are exact dups that
    * exact/minhash dedup already collapses; a real near pair is only
    * missed if ALL its shared buckets are over the cap). As with
    * minhashLsh, the cap bounds the buffer, not the pair output — pass a
    * smaller cap when the per-task pair count must be bounded too. */
  def embeddingNearDup(df: DataFrame, threshold: Double = 0.95,
      planesPerBand: Int = 8, bands: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 100000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    val spark = df.sparkSession
    import spark.implicits._
    val v = transform(col(vecCol), x => x.cast("double"))
    val norm = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    // norm bound to a lambda variable: evaluated once per row, not once
    // per element (inlined it would be an O(D^2) full-array aggregate
    // inside the per-element lambda)
    val unit = element_at(transform(array(greatest(norm, lit(1e-12))),
      nrm => transform(v, x => x / nrm)), 1)
    val prep = graft.core.Mat(df.select(col(idCol).as("id"), unit.as("u")))
    // deterministic pseudo-random hyperplanes, component j of plane p =
    // xxhash64(p, j) -> [-1, 1). PRECOMPUTED once on the driver and
    // broadcast (bands*planes*dim doubles) — the per-row work is then
    // bands*planes fused dot products in one tight mapPartitions loop,
    // not 48 interpreted hash-recomputing lambda chains per vector.
    val dim = prep.select(size(col("u"))).head().getInt(0)
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val planes = Array.tabulate(bands * planesPerBand)(p =>
      Array.tabulate(dim)(j =>
        XXH64.hashInt(j, XXH64.hashInt(p, 42L)).toDouble / 9.223372036854776e18))
    val bp = spark.sparkContext.broadcast(planes)
    val sig = prep.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val ps = bp.value
        it.flatMap { case (id, u) =>
          (0 until bands).iterator.map { b =>
            var h = 0L
            var i = 0
            while (i < planesPerBand) {
              val w = ps(b * planesPerBand + i)
              var d = 0.0; var j = 0
              val n = math.min(u.length, w.length)
              while (j < n) { d += u(j) * w(j); j += 1 }
              if (d >= 0) h |= (1L << i)
              i += 1
            }
            (id, b, h)
          }
        }
      }.toDF("id", "band", "h")
      .select(col("id"), struct(col("band"), col("h")).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dedup candidate IDS before re-attaching vectors: the distinct
    // shuffles 16-byte pairs, not embedding payloads. One capped
    // aggregation per bucket -> sorted members -> i<j expansion (the
    // shared dedup-family candidate shape; bounded at any skew).
    val candIds = sig.groupBy("bucket")
      .agg(sort_array(graft.functions.F.cappedCollectList(
        col("id"), maxBucket)).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      // duplicate input ids sort adjacent and would self-pair here
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    val cand = candIds
      .join(prep.select(col("id").as("id_a"), col("u").as("u_a")), Seq("id_a"))
      .join(prep.select(col("id").as("id_b"), col("u").as("u_b")), Seq("id_b"))
    // materialized verified pairs, then the bucket cache is released
    val out = graft.core.Mat(cand.withColumn("cosine",
        aggregate(zip_with(col("u_a"), col("u_b"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine"))
    sig.unpersist(false)
    out
  }
}
