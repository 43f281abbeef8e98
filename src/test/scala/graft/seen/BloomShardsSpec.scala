package graft.seen

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BloomShardsSpec extends AnyFunSuite with SparkSpec {

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"https://host${i % 37}.example/p$i")
    val df = keys.toDF("k")
    val shards = BloomShards.build(df, "k", nShards = 8, expectedPerShard = 2048)
    assert(keys.forall(shards.mightContain), "bloom false negative")
  }

  test("notSeen equals exact anti-join") {
    import spark.implicits._
    val seen = (0 until 3000).map(i => s"u$i").toDF("k")
    val candidates = (1500 until 4500).map(i => s"u$i").toDF("k")
    val viaBloom = BloomShards.notSeen(candidates, seen, "k", nShards = 4)
      .as[String].collect().sorted
    val exact = candidates.join(seen, Seq("k"), "left_anti")
      .as[String].collect().sorted
    assert(viaBloom.toSeq == exact.toSeq)
    assert(exact.length == 1500)
  }

  test("distributed shard lifecycle: build/update/probe with no driver-side bytes") {
    import spark.implicits._
    val n = 8
    val seen = (0 until 3000).map(i => s"u$i").toDF("k")
    val shardsDf = BloomShards.buildDf(seen, "k", n, expectedPerShard = 1024)
    assert(shardsDf.count() == n)
    // no false negatives through the cogroup probe
    val probeAll = BloomShards.probeFlagsDf(seen, "k", shardsDf, n)
    assert(probeAll.filter(not(col("maybe"))).count() == 0, "distributed bloom false negative")
    // incremental update keeps old + new members
    val shards2 = BloomShards.updateDf(shardsDf, (3000 until 3500).map(i => s"u$i").toDF("k"), "k", n)
    val all = (0 until 3500).map(i => s"u$i").toDF("k")
    assert(BloomShards.probeFlagsDf(all, "k", shards2, n)
      .filter(not(col("maybe"))).count() == 0)
    // parity with the driver-side path on the same input
    val driverShards = BloomShards.build(seen, "k", n, expectedPerShard = 1024)
    val probes = (0 until 6000 by 7).map(i => s"u$i")
    val distFlags = BloomShards.probeFlagsDf(probes.toDF("k"), "k", shardsDf, n)
      .as[(String, Boolean)].collect().toMap
    probes.foreach(k => assert(distFlags(k) == driverShards.mightContain(k), s"mismatch for $k"))
  }

  test("distributed probe/update refuse a truncated shard snapshot") {
    import spark.implicits._
    val shardsDf = BloomShards.buildDf((0 until 100).map(i => s"u$i").toDF("k"), "k", 4)
      .filter(col("shard") =!= 2) // simulate a partially-written snapshot
    val keys = (0 until 100).map(i => s"u$i").toDF("k")
    val ex = intercept[org.apache.spark.SparkException] {
      BloomShards.probeFlagsDf(keys, "k", shardsDf, 4).count()
    }
    assert(ex.getMessage.contains("seen-shard") || ex.getCause != null)
  }

  test("updateTouchedDf writes only touched shards; merged view equals a full update") {
    import spark.implicits._
    val n = 8
    val base = BloomShards.buildDf((0 until 1000).map(i => s"u$i").toDF("k"), "k", n,
      expectedPerShard = 1024)
    val newKeys = Seq("zz-new-key-1").toDF("k") // one key → exactly one touched shard
    val touched = BloomShards.updateTouchedDf(base, newKeys, "k", n)
    assert(touched.count() == 1, "delta write set must contain only the touched shard")
    // merge-on-read semantics: touched rows override, untouched come from base
    val merged = touched.unionByName(
      base.join(touched.select("shard"), Seq("shard"), "left_anti"))
    assert(merged.count() == n)
    val all = ((0 until 1000).map(i => s"u$i") :+ "zz-new-key-1").toDF("k")
    assert(BloomShards.probeFlagsDf(all, "k", merged, n)
      .filter(not(col("maybe"))).count() == 0, "merged delta view has a false negative")
    // bit-parity with the full-update path on an arbitrary probe set
    val full = BloomShards.updateDf(base, newKeys, "k", n)
    val probes = (0 until 3000 by 3).map(i => s"p$i").toDF("k")
    val a = BloomShards.probeFlagsDf(probes, "k", merged, n)
      .as[(String, Boolean)].collect().toMap
    val b = BloomShards.probeFlagsDf(probes, "k", full, n)
      .as[(String, Boolean)].collect().toMap
    assert(a == b)
  }

  test("repeated probeCol/notSeen calls accumulate no broadcast blocks") {
    import spark.implicits._
    import org.scalatest.concurrent.Eventually._
    import org.scalatest.time.{Seconds, Span}
    // probeCol ships shard bytes in the UDF closure (inside the Spark-managed
    // task-binary broadcast) instead of an explicit broadcast it could never
    // destroy (a Column has no post-action lifecycle seam) — so nothing can
    // accumulate across calls once jobs complete and references drop.
    val seen = (0 until 2000).map(i => s"u$i").toDF("k")
    val candidates = (1000 until 3000).map(i => s"u$i").toDF("k")
    def blocks() = org.apache.spark.graftaccess.GraftTestAccess.broadcastBlockCount(spark)
    System.gc()
    val baseline = eventually(timeout(Span(30, Seconds))) { val b = blocks(); b }
    (0 until 5).foreach { _ =>
      assert(BloomShards.notSeen(candidates, seen, "k", nShards = 4).count() == 1000)
    }
    eventually(timeout(Span(30, Seconds))) {
      System.gc() // let the ContextCleaner reap anything unreferenced
      assert(blocks() <= baseline + 2,
        s"broadcast blocks grew from $baseline to ${blocks()} over 5 probe calls")
    }
  }

  test("empty seen set: everything is new") {
    import spark.implicits._
    val seen = Seq.empty[String].toDF("k")
    val candidates = (0 until 10).map(i => s"x$i").toDF("k")
    val out = BloomShards.notSeen(candidates, seen, "k", nShards = 2)
    assert(out.count() == 10)
  }

  test("saturation signal: per-shard insert counters accumulate and flag over-capacity") {
    import spark.implicits._
    val n = 4
    val cap = 64L
    val empty = BloomShards.emptyDf(spark, n, expectedPerShard = cap)
    // fresh shards report zero inserts
    assert(BloomShards.saturationDf(empty, cap)
      .agg(max(col("inserts"))).head().getLong(0) == 0L)
    val s1 = BloomShards.updateDf(empty, (0 until 100).map(i => s"u$i").toDF("k"), "k", n)
    val s2 = BloomShards.updateDf(s1, (100 until 400).map(i => s"u$i").toDF("k"), "k", n)
    val sat = BloomShards.saturationDf(s2, cap)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    // counters accumulate across updates: 400 keys total across 4 shards
    assert(sat.map(_._2).sum == 400L, s"got $sat")
    // every shard holds ~100 keys against capacity 64: the signal must flag
    assert(sat.forall(_._3 > 1.0), s"expected fillRatio > 1 everywhere: $sat")
    // membership stays exact regardless of saturation (bloom = pre-filter)
    val probe = BloomShards.probeFlagsDf((0 until 400).map(i => s"u$i").toDF("k"), "k", s2, n)
    assert(probe.filter(not(col("maybe"))).count() == 0)
    // delta path counts too, and only emits touched shards
    val touched = BloomShards.updateTouchedDf(s2, Seq("u400").toDF("k"), "k", n)
    val tRows = touched.collect().map(r => r.getInt(0) -> r.getLong(2))
    val s2Counts = sat.map(t => t._1 -> t._2).toMap
    assert(tRows.length < n)
    assert(tRows.forall { case (sid, ins) => ins == s2Counts(sid) + 1L }, s"got ${tRows.toSeq}")
    // legacy shard tables (no inserts column) keep working: counts restart
    // at zero (a documented lower bound), membership untouched
    val legacy = s2.select("shard", "bytes")
    val s3 = BloomShards.updateDf(legacy, Seq("u401").toDF("k"), "k", n)
    assert(BloomShards.saturationDf(s3, cap).agg(max(col("inserts"))).head().getLong(0) == 1L)
    val probe3 = BloomShards.probeFlagsDf((0 until 400).map(i => s"u$i").toDF("k"), "k", s3, n)
    assert(probe3.filter(not(col("maybe"))).count() == 0)
  }
}
