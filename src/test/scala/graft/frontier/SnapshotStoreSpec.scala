package graft.frontier

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Snapshot-layer unit contract: manifest escaping and orphan robustness
  * (round-3 VERDICT wrong #2 + ADVICE). */
class SnapshotStoreSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-store-$tag").toString

  private def df2(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("manifest round-trips keys/values with quotes, backslashes and newlines") {
    val store = new SnapshotStore(tmp("esc"), spark)
    val nasty = Map(
      "nextRound" -> "0", "nextId" -> "1",
      """resource.used.px-"q"""" -> "3",
      "resource" -> "a\\b\nc\t\"d\"",
      "plain" -> "value")
    store.commit(0, df2(Seq(1L -> "a")), df2(Nil), None, nasty)
    val back = store.readMeta(0)
    nasty.foreach { case (k, v) =>
      assert(back.get(k).contains(v), s"key $k: got ${back.get(k)}, want $v")
    }
    assert(back("version") == "0" && back("hasResults") == "false")
  }

  test("allResults survives a truncated part file in a crash-orphaned results dir") {
    val dir = tmp("orphan")
    val store = new SnapshotStore(dir, spark)
    store.commit(0, df2(Seq(1L -> "a")), df2(Nil), Some(df2(Seq(10L -> "r0"))),
      Map("nextRound" -> "0", "nextId" -> "1"))
    store.commit(1, df2(Seq(1L -> "a")), df2(Nil), Some(df2(Seq(11L -> "r1"))),
      Map("nextRound" -> "1", "nextId" -> "1"))
    // crash artifact: an UNCOMMITTED results/v=2 with a truncated part file.
    // Reading the results ROOT let parquet schema inference sample it and
    // fail until manually cleaned; listing only committed dirs must not.
    val orphan = Paths.get(s"$dir/results/v=2")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-00000-trunc.snappy.parquet"),
      "PAR1 this is not a parquet file".getBytes("UTF-8"))
    val all = store.allResults().get.collect().map(_.getLong(0)).sorted
    assert(all.toSeq == Seq(10L, 11L))
  }
}
