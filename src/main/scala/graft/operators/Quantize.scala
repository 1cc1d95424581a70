package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Embedding compression: per-vector int8 scalar quantization — the
  * storage/transfer format an ANN index or training pipeline keeps when
  * the float32 corpus no longer fits. Rowwise (lo, scale) so each vector
  * reconstructs independently: code = round((v - lo) / scale) in
  * [0, 255], scale = (hi - lo) / 255.
  *
  * Map-only column expressions — one pass, no shuffle, so at 100 TB the
  * quantization cost is the scan. The arithmetic is per-element IEEE
  * ops plus a strict left-fold for the reconstruction error, so the
  * DuckDB oracle replays it bit-for-bit (both engines round doubles
  * half-away-from-zero for the non-negative code values).
  */
object Quantize {

  /** Adds `q_lo`, `q_hi`, `q_scale`, `codes` (array of 0..255 longs)
    * and `q_err` (mean absolute reconstruction error, rounded to 6).
    * A constant vector (hi == lo) quantizes to all-zero codes with
    * zero error.
    */
  def int8(df: DataFrame, vec: Column = col("embedding")): DataFrame = {
    val withBounds = df
      .withColumn("q_lo", array_min(vec).cast("double"))
      .withColumn("q_hi", array_max(vec).cast("double"))
      .withColumn("q_scale", (col("q_hi") - col("q_lo")) / lit(255.0))
    val codes = when(col("q_scale") === 0.0,
        transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, v =>
        round((v.cast("double") - col("q_lo")) / col("q_scale")).cast("long")))
    withBounds
      .withColumn("codes", codes)
      .withColumn("q_err", round(
        aggregate(
          zip_with(col("codes"), vec, (c, v) =>
            abs(c.cast("double") * col("q_scale") + col("q_lo") - v.cast("double"))),
          lit(0.0), (acc, x) => acc + x) / size(vec), 6))
  }

  /** Compact checksum of the code array (poly_hash over the joined
    * decimal string) so correctness gates can compare quantizations
    * without materializing the codes.
    */
  def codesHash(codes: Column): Column =
    poly_hash(concat_ws(",", transform(codes, _.cast("string"))))
}
