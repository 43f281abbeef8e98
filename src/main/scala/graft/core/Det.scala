package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing shared by the Spark engine and the in-memory
  * reference simulator.
  *
  * The reference uses `math.random()` for politeness delays
  * (`worker/.../timeout/RandomTimeout.scala:8-14`) and random user agents.
  * Exact crawl-order parity (BASELINE.json north_rule) requires every such
  * draw to be a pure function of the data, so all "randomness" is seeded
  * xxhash64 — the SAME function Spark SQL's `xxhash64(...)` computes (seed
  * 42), so a Catalyst expression and driver-side Scala agree bit-for-bit.
  */
object Det {
  val SparkSqlSeed: Long = 42L

  /** Identical to Spark SQL `xxhash64(string)` (seed 42). */
  def xxhash64(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), SparkSqlSeed)

  def xxhash64(s: String, seed: Long): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), seed)

  /** Non-negative modulus, identical to Spark SQL `pmod(x, m)`. */
  def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  /** Deterministic politeness delay in ticks ∈ [center-radius, center+radius]
    * — the seeded replacement for `RandomTimeout.computeRandom`
    * (`RandomTimeout.scala:8-14`). Keyed on (host, round) so two runs and the
    * simulator agree. */
  def politenessDelay(host: String, round: Int, centerTicks: Long, radiusTicks: Long): Long = {
    if (radiusTicks <= 0) centerTicks
    else centerTicks - radiusTicks + pmod(xxhash64(s"$host:$round"), 2 * radiusTicks + 1)
  }
}
