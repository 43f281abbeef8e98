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

  test("IVF top-k recall >= 0.6 vs brute force") {
    val bf = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 4, k = 5,
      centroidStride = 20, nprobe = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("cosine near-dup pairs are symmetric-safe and thresholded") {
    Similarity.cosineNearDup(emb, 0.3).collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0001)
    }
  }
}
