package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators over a `documents(doc_id, text, ...)` table —
  * the corpus-cleaning stage of a crawl-derived training-data pipeline.
  *
  * Scale notes (100 TB corpus):
  *  - exact: one hash-shuffle on a 16-byte digest — the cheapest possible
  *    grouping key; never group by raw text.
  *  - ngram/minhash: the pair-generating join is the cost center. MinHash
  *    LSH bounds it to band-bucket collisions (candidates ∝ near-dups, not
  *    n²); the exact-Jaccard verify then runs only on candidates. Band
  *    buckets are hash keys → uniform shuffle, no skew beyond true dup
  *    clusters (bounded by `maxBucketSize` guard).
  *  - simhash: signature is one 64-bit long per doc; banding on 16-bit
  *    chunks makes Hamming-≤k search a 4-way equi-join, not a cross join.
  */
object Dedup {

  /** Exact dedup by content fingerprint (md5 of normalized text):
    * keep the min doc_id of each group, count members. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .select(col("fp"), col("keep_id"), col("n_docs"))

  /** Distinct word-n-gram shingles per doc: (doc_id, sh). Single-pass UDF
    * (see TextCore for why this beats a HOF chain) then explode. */
  def shingleSets(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"), explode(shingleSetUdf(n)(col("text"))).as("sh"))

  /** Per-doc band hashes: (doc_id, band, bh) — shared by [[minhashLsh]]
    * (bucket join) and [[oversizedBuckets]] (capped-bucket report). */
  private def bandHashes(documents: DataFrame, n: Int, k: Int, bands: Int): DataFrame =
    documents
      .select(col("doc_id"), explode(minhashBandsUdf(n, k, bands)(col("text"))).as("bk"))
      .select(col("doc_id"), col("bk._1").as("band"), col("bk._2").as("bh"))

  /** The buckets [[minhashLsh]] DROPPED under the same arguments: one row
    * per (band, bh) whose population exceeds `maxBucketSize`, with the
    * count. Run this after a capped LSH pass to see which degenerate
    * clusters (boilerplate/empty docs) were excluded from the pair join —
    * their members are better handled as a connected component than as
    * O(size²) pairs. */
  def oversizedBuckets(documents: DataFrame, n: Int = 3, k: Int = 64,
                       bands: Int = 16, maxBucketSize: Int = 1 << 16): DataFrame = {
    require(k % bands == 0)
    bandHashes(documents, n, k, bands)
      .groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucketSize)
  }

  /** Exact n-gram Jaccard similarity for every doc pair sharing ≥1 shingle,
    * thresholded. O(pairs-sharing-a-shingle); at corpus scale use
    * [[minhashLsh]] which produces the same pairs above the threshold. */
  def ngramJaccard(documents: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val s = shingleSets(documents, n)
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = s.as("a").join(s.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash + banded LSH near-dup pairs, exact-Jaccard verified.
    *
    * shingle → k-minhash signature → `bands` band hashes → self-join on
    * (band, hash) → candidate pairs → exact Jaccard ≥ threshold. With
    * k=64, 16×4 banding, a pair at s=0.8 is missed with prob
    * (1-0.8⁴)¹⁶ ≈ 2e-4; at the planted-dup similarity (≥0.97) ≈ 3e-17 —
    * the verify step makes precision exact, recall is the LSH curve.
    *
    * `maxBucketSize` bounds the candidate explosion of degenerate buckets
    * (N boilerplate/empty docs hashing to one (band, bh) go N²/2 without
    * it): buckets larger than the cap are DROPPED before the pair join, so
    * per-bucket work is ≤ maxBucketSize²/2. A dropped bucket can only lose
    * pairs inside a mega-cluster, which every other band still has 15
    * chances to emit — and true mega-clusters are better handled as
    * connected components than as all-pairs output. Not silent: inspect
    * [[oversizedBuckets]] with the same arguments to see what was capped. */
  def minhashLsh(documents: DataFrame, n: Int = 3, k: Int = 64,
                 bands: Int = 16, threshold: Double = 0.8,
                 maxBucketSize: Int = 1 << 16): DataFrame = {
    require(k % bands == 0)
    val sigs = bandHashes(documents, n, k, bands)
    // bucket-size guard: count per (band, bh), keep rows of sane buckets.
    // The count and the join shuffle on the same key — co-partitioned,
    // one extra narrow stage, no second pass over `documents`.
    val sized = sigs.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .select(col("band"), col("bh"))
    val kept = sigs.join(sized, Seq("band", "bh"))
    val candidates = kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify on candidates only
    val s = shingleSets(documents, n)
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    candidates
      .join(s.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, banded into 4×16-bit
    * chunks (a pair within Hamming distance 3 must agree on ≥1 chunk —
    * pigeonhole), verified by true Hamming distance ≤ maxHamming.
    *
    * The 4-chunk banding only guarantees recall for maxHamming ≤ 3: at 4+
    * a pair can differ in every chunk and silently vanish while the verify
    * step makes the output LOOK exact — hence the hard require. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding is exact only for maxHamming in [0,3], got $maxHamming")
    // no persist: this is library code — the two self-join sides share the
    // scan's exchange via ReuseExchange, and a cache here would leak past
    // return (round-1 ADVICE)
    val fps = documents
      .select(col("doc_id"), simhashUdf(col("text")).as("fp"))
    val chunks = fps.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("ck",
        call_function("shiftright", col("fp"), col("c") * 16).bitwiseAND(lit(0xFFFFL)))
    val pairs = chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fpa"), col("b.fp").as("fpb"))
      .distinct()
      .withColumn("hamming", hamming64(col("fpa"), col("fpb")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    pairs
  }

  /** Per-doc simhash fingerprints (hex), for inspection/round-trip. */
  def simhashTable(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), lpad(hex(simhashUdf(col("text"))), 16, "0").as("simhash"))
}
