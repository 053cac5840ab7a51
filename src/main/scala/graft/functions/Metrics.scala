package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Evaluation metrics as column expressions — kowari src/utils.rs:64-96.
  * Both clamp k exactly like the reference. */
object Metrics {

  /** |expected[..k] ∩ actual[..k]| / k with k clamped to both lengths
    * (src/utils.rs:64-79). Arrays are ranked id lists. */
  def recallAtK(expected: Column, actual: Column, k: Int): Column = {
    val kk = least(lit(k), size(expected), size(actual))
    when(kk === 0, lit(0.0)).otherwise(
      size(array_intersect(slice(expected, lit(1), kk), slice(actual, lit(1), kk)))
        .cast("double") / kk.cast("double"))
  }

  /** |actual[..k] ∩ expected| / k with k clamped to actual length
    * (src/utils.rs:81-96). */
  def precisionAtK(expected: Column, actual: Column, k: Int): Column = {
    val kk = least(lit(k), size(actual))
    when(kk === 0, lit(0.0)).otherwise(
      size(array_intersect(slice(actual, lit(1), kk), expected))
        .cast("double") / kk.cast("double"))
  }
}
