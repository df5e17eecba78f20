package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** TEST-ONLY internal seam: save/restore `SparkContext.checkpointDir`
  * (a `private[spark]` var with a setter but no public UN-setter). The
  * shared-session spec suite must restore the unset state after
  * exercising the reliable-checkpoint mode, or every later suite in the
  * JVM would silently run under reliable checkpoints.
  */
object TestCheckpointShim {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
