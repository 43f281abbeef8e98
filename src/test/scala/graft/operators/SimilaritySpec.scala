package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k: k rows per query, cos descending, no self-match") {
    val rows = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)),
        s"cos not descending for query $q")
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("RP-LSH near-dup equals exact cosine pairs on planted dups (production band shape)") {
    import spark.implicits._
    // deterministic synthetic corpus with planted high-cosine near-dups:
    // base vectors + slightly-perturbed copies (cos > 0.95)
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(32)(d => (graft.core.Det.pmod(
        graft.core.Det.xxhash64(s"v:$seed:$d"), 2000L) - 1000L).toFloat / 1000f)
    def perturb(v: Seq[Float], seed: Int): Seq[Float] =
      v.zipWithIndex.map { case (x, d) => x + (graft.core.Det.pmod(
        graft.core.Det.xxhash64(s"p:$seed:$d"), 100L) - 50L).toFloat / 5000f }
    val bases = (0 until 40).map(i => (i.toLong, vec(i)))
    val dups = (0 until 10).map(i => (100L + i, perturb(bases(i)._2, i)))
    val df = (bases ++ dups).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDup(df, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size >= 10, s"planted dups missing: ${exact.size}")
    val lsh = Similarity.rpLshNearDup(df, threshold = 0.9, bitsPerBand = 8, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact, s"missing=${exact -- lsh} spurious=${lsh -- exact}")
    // bucket guard bounds a degenerate corpus (all-identical vectors)
    val same = (0L until 30L).map(i => (i, bases.head._2)).toDF("vec_id", "embedding")
    assert(Similarity.rpLshNearDup(same, 0.9, 8, 32, maxBucketSize = 5).count() == 0)
    assert(Similarity.rpLshNearDup(same, 0.9, 8, 32).count() == 30L * 29 / 2)
  }

  test("IVF top-k recall >= 0.6 vs brute force") {
    val bf = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 4, k = 5,
      centroidStride = 20, nprobe = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("trained IVF centroids: recall does not drop and lists do not unbalance") {
    val bf = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(trainIters: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, nQueries = 4, k = 5,
        centroidStride = 20, nprobe = 10, trainIters = trainIters).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      bf.count(ivf.contains).toDouble / bf.size
    }
    val r0 = recallOf(0); val r3 = recallOf(3)
    assert(r3 >= r0 - 1e-9, s"Lloyd refinement dropped recall: $r0 -> $r3")
    // balance: max/mean list population must not worsen — a skewed
    // quantizer concentrates probes on hot lists at scale
    def spread(trainIters: Int): Double = {
      val ns = Similarity.ivfListSizes(emb, 20, trainIters).collect()
        .map(_.getLong(1).toDouble)
      ns.max / (ns.sum / ns.length)
    }
    val s0 = spread(0); val s3 = spread(3)
    assert(s3 <= s0 + 1e-9, s"Lloyd refinement worsened balance: max/mean $s0 -> $s3")
  }

  test("cosine near-dup pairs are symmetric-safe and thresholded") {
    Similarity.cosineNearDup(emb, 0.3).collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0001)
    }
  }
}
