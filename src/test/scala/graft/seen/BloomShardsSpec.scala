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

  test("empty seen set: everything is new") {
    import spark.implicits._
    val seen = Seq.empty[String].toDF("k")
    val candidates = (0 until 10).map(i => s"x$i").toDF("k")
    val out = BloomShards.notSeen(candidates, seen, "k", nShards = 2)
    assert(out.count() == 10)
  }
}
