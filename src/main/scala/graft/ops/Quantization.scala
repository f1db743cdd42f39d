package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopKAgg

/** Corpus-calibrated int8 embedding quantization + search in the
  * quantized domain.
  *
  * The per-ROW max-abs quantizer ([[graft.functions.VectorFunctions
  * .quantizeInt8]]) compresses storage but its scale differs per
  * vector, so dot products between two quantized vectors are
  * meaningless. This operator learns ONE affine map per DIMENSION
  * from the whole corpus — `q(v) = round((v - lo_d) * 254 / (hi_d -
  * lo_d)) - 127` — which preserves cross-vector comparability:
  * ranking by the integer dot product of calibrated int8 codes is
  * the memory-bound ANN serving path (4x less bandwidth than float32,
  * SIMD integer arithmetic, exact integer scores — no float drift,
  * so results are deterministic under any partitioning).
  *
  * Scale shape: calibration is a posexplode + partial-agg groupBy on
  * the dimension index — each map task reduces to at most `dim` rows
  * before the shuffle, and the result (dim rows) broadcasts back as
  * a KB-sized array literal join. Quantization itself is a narrow
  * zero-shuffle map. Search reuses the C66 bounded top-k heap: the
  * shuffle carries at most k pairs per (task, query), never the
  * scored corpus.
  */
object Quantization {

  /** Per-dimension corpus calibration: (dim, lo, hi), `dim` rows. */
  def fitMinMax(df: DataFrame, vec: Column): DataFrame =
    df.select(posexplode(vec.cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))

  /** Calibration rows collapsed to one dim-ordered array row for the
    * broadcast join (array_sort on struct(dim,..) orders by dim).
    */
  private def calArray(calib: DataFrame): DataFrame =
    calib.agg(array_sort(collect_list(struct(col("dim"), col("lo"), col("hi"))))
      .as("cal"))

  /** Quantize each vector against the broadcast per-dim calibration:
    * q = round((v - lo) * 254 / (hi - lo)) - 127 in [-127, 127]
    * (a constant dimension, hi == lo, collapses to 0). The argument
    * of round() is non-negative, so HALF_UP here is engine-portable.
    * Returns (vec_id, qvec: array<int>).
    */
  def quantize(df: DataFrame, id: Column, vec: Column, calib: DataFrame): DataFrame =
    df.select(id.cast("bigint").as("vec_id"), vec.cast("array<double>").as("v"))
      .crossJoin(broadcast(calArray(calib)))
      .select(col("vec_id"),
        zip_with(col("v"), col("cal"), (x, c) =>
          when(c("hi") === c("lo"), lit(0))
            .otherwise((round((x - c("lo")) * lit(254.0) / (c("hi") - c("lo")))
              .cast("int") - 127)))
          .as("qvec"))

  /** Top-k per query by exact integer dot product over int8 codes.
    *
    * @param qcorpus (vec_id, qvec) — [[quantize]] output
    * @param queries (query_id, qvec) — quantized with the SAME calibration
    * @return (query_id, vec_id, iprod, rank), rank 1..k per query in
    *         (iprod desc, vec_id asc) order
    */
  def quantizedTopK(qcorpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    qcorpus.crossJoin(broadcast(queries.select(
        col("query_id").cast("bigint").as("query_id"), col("qvec").as("qq"))))
      .select(col("query_id"), col("vec_id"),
        aggregate(
          zip_with(col("qvec"), col("qq"), (a, b) => (a * b).cast("bigint")),
          lit(0L), (acc, x) => acc + x).as("iprod"))
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("iprod"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.id").as("vec_id"),
        col("e.score").as("iprod"), (col("r0") + 1).cast("bigint").as("rank"))
}
