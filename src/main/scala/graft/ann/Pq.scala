package graft.ann

/** Product quantizer (Jegou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public paper): the D-dim unit vector is
  * split into `m` subspaces of D/m components; each subspace gets its own
  * `ksub`-centroid codebook, so a vector compresses to m bytes (ksub <=
  * 256). Query scoring is ADC (asymmetric distance computation): one
  * lookup table of q-subvector x sub-centroid inner products per (query,
  * cell) — O(ksub * D) once — then every candidate code scores in O(m)
  * table adds instead of O(D) multiplies. At dim 768 / m 16 that is a
  * 192x byte shrink of the scanned index and ~48x less arithmetic per
  * candidate, which is what makes a 10^12-vector IVF scan memory- and
  * compute-feasible; the ADC top-R then reranks EXACTLY with the full
  * float vectors, so precision loss is bounded to candidates outside the
  * top-R (measured by the recall spec, not assumed).
  *
  * Codebooks train on a driver-side sample (standard practice: PQ
  * codebooks need thousands of points, not the corpus) with seeded
  * deterministic init, and broadcast at m * ksub * (D/m) floats — a few
  * hundred KB at any realistic setting.
  */
final class Pq private (val m: Int, val ksub: Int, val dsub: Int,
    /** [sub][centroid][component] */
    val books: Array[Array[Array[Float]]]) extends Serializable {

  def dim: Int = m * dsub

  /** nearest sub-centroid per subspace (L2 over the sub-vector — the
    * standard PQ training/encode metric even for inner-product search). */
  def encode(v: Array[Float]): Array[Byte] = {
    val code = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val book = books(s); val off = s * dsub
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0; var j = 0
        while (j < dsub) {
          val t = v(off + j) - cent(j); d += t * t; j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  /** ADC lookup table for query q: lut(s * ksub + c) = <q_sub_s, book_s_c>.
    * Built once per (query, probed cell), reused across every candidate
    * code in the cell. */
  def lut(q: Array[Float]): Array[Float] = {
    val t = new Array[Float](m * ksub)
    var s = 0
    while (s < m) {
      val book = books(s); val off = s * dsub
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0; var j = 0
        while (j < dsub) { d += q(off + j) * cent(j); j += 1 }
        t(s * ksub + c) = d.toFloat
        c += 1
      }
      s += 1
    }
    t
  }

  /** approximate inner product of the query behind `lut` with `code`. */
  @inline def adc(lutArr: Array[Float], code: Array[Byte]): Float = {
    var s = 0; var acc = 0.0f
    while (s < m) { acc += lutArr(s * ksub + (code(s) & 0xff)); s += 1 }
    acc
  }
}

object Pq {
  /** Rebuild a quantizer from persisted codebooks ([sub][cent][comp]). */
  def fromBooks(books: Array[Array[Array[Float]]]): Pq = {
    require(books.nonEmpty && books(0).nonEmpty)
    new Pq(books.length, books(0).length, books(0)(0).length, books)
  }

  /** Train per-subspace codebooks with seeded Lloyd k-means on a sample
    * (rows in deterministic hash order). Empty clusters keep their seed.
    * Deterministic: same sample + seed order -> same codebooks. */
  def train(sample: Array[Array[Float]], m: Int, ksub: Int = 256,
      iters: Int = 10): Pq = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(ksub <= 256, s"ksub $ksub exceeds one byte")
    val dsub = dim / m
    val k = math.min(ksub, sample.length)
    val books = Array.tabulate(m) { s =>
      val off = s * dsub
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + dsub))
      // stride-sampled init over the (hash-ordered, unbiased) sample
      val stride = math.max(1, sub.length / k)
      var cents = Array.tabulate(k)(i => sub(i * stride).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        var i = 0
        while (i < sub.length) {
          val v = sub(i)
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < k) {
            val ct = cents(c)
            var d = 0.0; var j = 0
            while (j < dsub) { val t = v(j) - ct(j); d += t * t; j += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          val sm = sums(best); var j = 0
          while (j < dsub) { sm(j) += v(j); j += 1 }
          counts(best) += 1
          i += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(j => (sums(c)(j) / counts(c)).toFloat))
        it += 1
      }
      // pad degenerate books (sample smaller than ksub) so codes stay
      // in-range: repeat the last centroid
      if (k < ksub) cents ++ Array.fill(ksub - k)(cents(k - 1)) else cents
    }
    new Pq(m, ksub, dsub, books)
  }
}
