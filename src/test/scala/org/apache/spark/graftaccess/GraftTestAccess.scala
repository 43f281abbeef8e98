package org.apache.spark.graftaccess

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession

/** Test-only bridge into `private[spark]` surfaces: counts the broadcast
  * blocks currently resident in the block manager, so BloomShardsSpec can
  * pin "repeated probe calls accumulate no broadcasts" against the actual
  * storage layer instead of trusting the code's word. */
object GraftTestAccess {
  def broadcastBlockCount(spark: SparkSession): Int =
    SparkEnv.get.blockManager.master
      .getMatchingBlockIds(_.isBroadcast, askStorageEndpoints = true)
      .size
}
