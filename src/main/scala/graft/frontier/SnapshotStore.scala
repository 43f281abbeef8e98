package graft.frontier

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layer over Parquet (SURVEY.md §7.0: no Iceberg
  * jars offline, so this provides the same commit semantics behind an
  * API-shaped seam a real Iceberg catalog could replace).
  *
  * Layout under `baseDir`:
  * {{{
  *   v=K/frontier/   v=K/hosts/   v=K/results/     (parquet data)
  *   manifest-K.json                                (atomic commit marker)
  * }}}
  *
  * A version K is committed iff `manifest-K.json` exists; the manifest is
  * written via temp-file + ATOMIC_MOVE rename (write-audit-publish), which
  * replaces the reference's DB transactions (`MongoQueueTaskProvider.scala:
  * 50-72`, `SqlQueueTaskProvider.scala:21,37`). A killed job leaves at most
  * an orphan `v=K/` directory with no manifest — resume overwrites it,
  * giving exactly-once round semantics (lease recovery F7/F8 for free).
  *
  * The manifest carries the driver-side scalars (round, nextId, counters)
  * that make a resumed run bit-identical to an uninterrupted one.
  */
final class SnapshotStore(val baseDir: String, spark: SparkSession) {

  private def dir(v: Int, part: String): String = s"$baseDir/v=$v/$part"
  private def manifestPath(v: Int): Path = Paths.get(s"$baseDir/manifest-$v.json")

  Files.createDirectories(Paths.get(baseDir))

  def latestVersion: Option[Int] = {
    val p = Paths.get(baseDir)
    if (!Files.exists(p)) None
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toInt }
      .maxOption
  }

  def commit(
      v: Int,
      frontier: DataFrame,
      hosts: DataFrame,
      results: Option[DataFrame],
      metaLazy: => Map[String, String]): Unit = {
    // write-audit-publish: data first (overwrite any orphan), manifest last.
    // `metaLazy` is by-name: evaluated only after the data writes, so it can
    // read Observation metrics collected during the frontier write.
    frontier.write.mode("overwrite").parquet(dir(v, "frontier"))
    hosts.write.mode("overwrite").parquet(dir(v, "hosts"))
    results.foreach(_.write.mode("overwrite").parquet(dir(v, "results")))
    val json = (metaLazy + ("version" -> v.toString, "hasResults" -> results.isDefined.toString))
      .map { case (k, w) => s""""$k":"$w"""" }.mkString("{", ",", "}")
    val tmp = Paths.get(s"$baseDir/.manifest-$v.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE)
  }

  def readMeta(v: Int): Map[String, String] = {
    val s = Files.readString(manifestPath(v))
    // flat string-to-string json written by commit()
    """"([^"]+)":"([^"]*)"""".r.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap
  }

  /** The frontier at version v. A "full" commit is read directly; a
    * "delta" commit (merge-on-read layout) is reconstructed as the latest
    * full base plus every delta up to v, keeping the NEWEST row per id —
    * Iceberg merge-on-read semantics over plain parquet. The window's
    * shuffle is on id, the same key the status rewrite shuffles on anyway;
    * what the layout buys is write cost ∝ changed rows instead of
    * ∝ frontier size per round. */
  def readFrontier(v: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val meta = readMeta(v)
    meta.get("frontierFormat") match {
      case Some("delta") =>
        val base = meta("frontierBase").toInt
        val parts = (base to v).map(k =>
          spark.read.parquet(dir(k, "frontier")).withColumn("__v", lit(k)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("__v").desc)
        parts.reduce(_ unionByName _)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__v", "__rn")
      case _ => spark.read.parquet(dir(v, "frontier"))
    }
  }
  def readHosts(v: Int): DataFrame = spark.read.parquet(dir(v, "hosts"))

  /** R7 seen-filter shards ((shard, bytes) rows), written as part of the
    * same write-audit-publish cycle when the engine runs with the bloom
    * pre-filter; absent otherwise. Must be written BEFORE `commit` seals
    * the manifest. */
  def writeSeen(v: Int, seen: DataFrame): Unit =
    seen.write.mode("overwrite").parquet(dir(v, "seen"))
  def hasSeen(v: Int): Boolean = Files.exists(Paths.get(dir(v, "seen")))
  def readSeen(v: Int): DataFrame = spark.read.parquet(dir(v, "seen"))
  def hasResults(v: Int): Boolean = readMeta(v).get("hasResults").contains("true")
  def readResults(v: Int): DataFrame = spark.read.parquet(dir(v, "results"))

  /** All fetch records from committed snapshots ≤ latest, i.e. the crawl
    * history. Orphan (uncommitted) result dirs are ignored by construction. */
  def allResults(): Option[DataFrame] = latestVersion.flatMap { latest =>
    val vs = (0 to latest).filter(v => Files.exists(manifestPath(v)) && hasResults(v))
    if (vs.isEmpty) None
    else Some(vs.map(v => readResults(v)).reduce(_ unionByName _))
  }
}
