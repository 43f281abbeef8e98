package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Dedup operator family over the driver's documents table (sf0.001 for
  * speed; the driver's DuckDB oracle re-checks at sf0.01). */
class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exact dedup groups cover all docs and keep the min id") {
    val d = docs
    val total = d.count()
    val ex = Dedup.exact(d).collect()
    assert(ex.map(_.getLong(2)).sum == total)   // every doc in exactly one group
    // keep_id must be a member: re-derive fingerprint for keep ids
    val fps = TextAnalysis.fingerprints(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ex.foreach(r => assert(fps(r.getLong(1)) == r.getString(0)))
  }

  test("minhash LSH finds exactly the exact-jaccard pairs at threshold 0.8") {
    val d = docs
    val exact = Dedup.ngramJaccard(d, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLsh(d, 3, 64, 16, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exact, s"missing=${exact -- lsh} spurious=${lsh -- exact}")
  }

  test("LSH bucket guard bounds a pathological all-identical corpus") {
    import spark.implicits._
    // 40 byte-identical docs: every (band, bh) bucket holds all 40 docs.
    val same = (0L until 40L).map(i => (i, "the same boilerplate text repeated again and again"))
      .toDF("doc_id", "text")
    // guard off (cap above bucket size): the true answer is all C(40,2) pairs
    val unguarded = Dedup.minhashLsh(same, maxBucketSize = 100).count()
    assert(unguarded == 40L * 39 / 2)
    // guard on: every bucket is oversize → dropped → zero candidate pairs
    // (the bounded-candidates property: per-bucket work ≤ cap²/2, never N²)
    val guarded = Dedup.minhashLsh(same, maxBucketSize = 10).count()
    assert(guarded == 0)
    // and the guard must not disturb a sane corpus (buckets ≪ default cap)
    val exact = Dedup.ngramJaccard(docs, 3, 0.8).collect().length
    val lsh = Dedup.minhashLsh(docs, 3, 64, 16, 0.8).collect().length
    assert(lsh == exact)
  }

  test("oversizedBuckets reports exactly the buckets the guard dropped") {
    import spark.implicits._
    val same = (0L until 40L).map(i => (i, "the same boilerplate text repeated again and again"))
      .toDF("doc_id", "text")
    // identical docs: every band has one bucket holding all 40 docs
    val over = Dedup.oversizedBuckets(same, maxBucketSize = 10).collect()
    assert(over.length == 16, s"one oversize bucket per band expected, got ${over.length}")
    assert(over.forall(_.getLong(2) == 40L))
    // cap above the population → nothing reported (mirror of guard-off)
    assert(Dedup.oversizedBuckets(same, maxBucketSize = 100).count() == 0)
    // sane corpus under the default cap → nothing capped, nothing reported
    assert(Dedup.oversizedBuckets(docs).count() == 0)
  }

  test("simhash rejects maxHamming the banding cannot guarantee") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, maxHamming = 4)
    }
  }

  test("jaccard is symmetric-safe (a<b) and within [0,1]") {
    Dedup.ngramJaccard(docs, 3, 0.5).collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("simhash pairs: near-dup docs have close fingerprints") {
    val d = docs
    // planted near-dups (jaccard >= 0.9) should mostly appear within hamming<=3
    val nearDups = Dedup.ngramJaccard(d, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(d, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (nearDups.nonEmpty) {
      // simhash at hamming<=3 is a coarser sieve than minhash — banding
      // guarantees recall only within hamming<=3; near-dups can land at 4-6
      val recall = nearDups.count(sim.contains).toDouble / nearDups.size
      assert(recall >= 0.7, s"simhash recall $recall over ${nearDups.size} planted pairs")
    }
    // and fingerprints must be deterministic across two runs
    val f1 = Dedup.simhashTable(d).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val f2 = Dedup.simhashTable(d).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(f1 == f2)
  }

  /** Pure-Scala union-find truth for [[Dedup.connectedComponents]]: union by
    * min root, so every set's root is its minimum id. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("connected components resolve the near-dup pair graph to min-id clusters") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccard(docs, 3, 0.8).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "test data should contain planted near-dups")
    val got = Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap == ufComponents(pairs))
    got.foreach(t => assert(t._2 == t._3, "keep_id must equal the component min"))
    // every doc appears exactly once
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("components close transitively on a pathological chain (diameter = n)") {
    import spark.implicits._
    // each doc near-dup ONLY to its neighbors: min-label propagation would
    // need n rounds; the star operations must contract it in O(log² n)
    val n = 257
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    val cc = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length == n)
    assert(cc.forall(_._2 == 0L), s"chain must resolve to one min-0 component")
    // randomized multi-component graph vs the union-find truth (incl.
    // duplicate and reversed edges)
    val rnd = new scala.util.Random(42)
    val rpairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val rgot = Dedup.connectedComponents(rpairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rgot == ufComponents(rpairs))
    // empty pair graph → empty result, correct schema
    val empty = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(empty.columns.toSeq == Seq("doc_id", "component_id", "keep_id"))
    assert(empty.count() == 0)
  }
}
