package graft.functions

import graft.core.Det

/** Pure-Scala single-pass implementations of the tokenize → shingle →
  * minhash/simhash chain, shared by the Spark UDFs (TextFunctions) and unit
  * tests.
  *
  * Why UDFs here and not `functions._` compositions: Spark's higher-order
  * array functions (`transform`/`aggregate`/`filter`) evaluate INTERPRETED
  * (CodegenFallback), and CollapseProject inlines aliased array
  * intermediates into lambda bodies, so a k=64 minhash expressed as nested
  * `transform`s re-runs the tokenizer regex O(k·shingles) times per row —
  * measured minutes/row at sf0.01. A one-pass Scala function behind a UDF
  * is the faster *and* simpler plan: one string in, one small array out,
  * no interpreted expression-tree walking. (A custom codegen Expression is
  * the upgrade path if UDF serialization ever shows up in profiles.)
  *
  * Semantics are locked to the SQL twins used by the DuckDB oracle:
  * tokenize = `lower(text)` split on `[^a-z0-9]+`, empties dropped;
  * hash family i = xxhash64 seeded by i (Det.xxhash64 == Spark/DuckDB-
  * independent, deterministic).
  */
object TextCore {

  private val TokenRe = "[^a-z0-9]+"

  def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split(TokenRe, -1).filter(_.nonEmpty)

  /** Word n-gram shingles (space-joined), document order, with duplicates. */
  def shinglesOf(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))

  def distinctShinglesOf(text: String, n: Int): Array[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    shinglesOf(tokensOf(text), n).foreach(out.add)
    out.toArray
  }

  /** k-minhash signature: sig(i) = min over shingles of xxhash64(sh, seed=i). */
  def minhashSig(shingles: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val sh = shingles(j)
      var i = 0
      while (i < k) {
        val h = Det.xxhash64(sh, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    sig
  }

  /** LSH band keys: one combined hash per rows-per-band slice. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rpb = sig.length / bands
    Array.tabulate(bands) { b =>
      var acc = Det.xxhash64(s"band:$b")
      var i = b * rpb
      while (i < (b + 1) * rpb) {
        acc = Det.xxhash64(java.lang.Long.toHexString(sig(i)), acc)
        i += 1
      }
      acc
    }
  }

  /** 64-bit SimHash over tokens: bit j is the sign of Σ ±1 by bit j of
    * xxhash64(token). */
  def simhash(toks: Array[String]): Long = {
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = Det.xxhash64(toks(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  // ---------------- vector math (double, sequential — matches the
  // `list_sum(list_transform(...))` DuckDB oracle exactly) ----------------

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  def toDouble(v: Seq[Float]): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
    out
  }
}
