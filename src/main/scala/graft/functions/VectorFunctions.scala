package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (similarity search, near-dup
  * detection) over `array<float>` embedding columns.
  *
  * The per-pair arithmetic is a tight Scala loop behind a UDF: Spark's
  * array higher-order functions evaluate interpreted (CodegenFallback),
  * which costs ~µs/element in pair joins — a plain double[] loop is two
  * orders faster and bit-identical (sequential left-to-right accumulation
  * in double, matching the `list_sum(list_transform(...))` DuckDB oracle).
  * At 100 TB the dominant cost is the pair-generating join, not this math;
  * what matters is that the math never forces an extra shuffle or breaks
  * the surrounding codegen stages.
  */
object VectorFunctions {

  /** array<float> → array<double>, once per row before any pair join. */
  val toDoubleUdf: UserDefinedFunction = udf((v: Seq[Float]) => TextCore.toDouble(v))

  val normUdf: UserDefinedFunction =
    udf((v: Seq[Double]) => TextCore.norm(v.toArray))

  val dotUdf: UserDefinedFunction =
    udf((a: Seq[Double], b: Seq[Double]) => TextCore.dot(a.toArray, b.toArray))

  /** Cosine from pre-cast double arrays + precomputed norms. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dotUdf(a, b) / (na * nb)

  // ---------------- random-hyperplane (sign) LSH --------------------------

  /** Deterministic hyperplane matrix for sign-LSH: entry (i, d) is a
    * seeded uniform draw in [-1, 1) from Det.xxhash64 — the same rows on
    * every executor and every run, no broadcast needed. Cached per
    * (nBits, dims). */
  private val hyperCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private[graft] def hyperplanes(nBits: Int, dims: Int): Array[Array[Double]] =
    hyperCache.computeIfAbsent((nBits, dims), { case (b, d) =>
      Array.tabulate(b, d)((i, j) =>
        graft.core.Det.xxhash64(s"rp:$i:$j").toDouble / Long.MaxValue)
    })

  /** (band, bandKey) pairs of the sign-LSH signature: bit i is the sign of
    * v · h_i; `bitsPerBand` consecutive bits pack into one band key. Two
    * vectors at angle θ agree on a bit with prob 1 − θ/π, so a band
    * collides with that prob^bitsPerBand — the caller picks the
    * (bitsPerBand, bands) point on the recall/blocking curve. */
  def rpBandsUdf(bitsPerBand: Int, bands: Int): UserDefinedFunction =
    udf((v: Seq[Double]) => {
      val nBits = bitsPerBand * bands
      val arr = v.toArray
      val h = hyperplanes(nBits, arr.length)
      Array.tabulate(bands) { b =>
        var key = 0L
        var i = b * bitsPerBand
        while (i < (b + 1) * bitsPerBand) {
          key = (key << 1) | (if (TextCore.dot(h(i), arr) >= 0) 1L else 0L)
          i += 1
        }
        (b, key)
      }
    })
}
