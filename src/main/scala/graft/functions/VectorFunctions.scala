package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns,
  * composed from Spark's native higher-order functions — evaluated
  * per-row inside the executor with no serialization boundary and no
  * UDF. All arithmetic is double (IEEE, bit-identical to the DuckDB
  * oracle's `list_cosine_similarity` on DOUBLE[]), folding
  * left-to-right in array order.
  */
object VectorFunctions {

  private def toDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — left-to-right fold, double accumulator. Backed by the
    * codegen'd [[graft.plans.DotProductExpr]] (identical arithmetic
    * to the HOF composition below, one fused loop).
    */
  def dotProduct(a: Column, b: Column): Column =
    graft.plans.DotProductExpr.dot(toDouble(a), toDouble(b))

  /** HOF formulation of the same arithmetic (parity baseline). */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ aᵢ² */
  def normSq(a: Column): Column = dotProduct(a, a)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a,b) = a·b / (|a|·|b|) — matches DuckDB list_cosine_similarity.
    * Backed by the codegen'd [[graft.plans.CosineSimilarityExpr]]
    * (single fused loop inside whole-stage codegen); arithmetic is
    * identical to [[cosineSimilarityHof]].
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.plans.CosineSimilarityExpr.cosine(toDouble(a), toDouble(b))

  /** Higher-order-function formulation of the same arithmetic (kept
    * as the composition baseline the native expression is verified
    * against).
    */
  def cosineSimilarityHof(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions:
    * out[i] = v · R_i / sqrt(outDim), R a deterministic Gaussian
    * matrix from the seed (same generator as Similarity.hyperplanes).
    * A narrow map — the standard dimensionality-reduction step before
    * ANN indexing; distances are preserved within the JL bound. The
    * projection vectors are data-independent constants, so an oracle
    * can embed them as literals.
    */
  def randomProject(vec: Column, inDim: Int, outDim: Int, seed: Long = 7L): Column = {
    val rows = projectionMatrix(inDim, outDim, seed)
    val scale = 1.0 / math.sqrt(outDim)
    array(rows.map(r => dotProduct(vec, typedLit(r)) * scale): _*)
  }

  /** The projection rows (outDim × inDim), deterministic per seed. */
  def projectionMatrix(inDim: Int, outDim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(inDim)(rnd.nextGaussian()))
  }

  /** Squared euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Unit-normalize a vector (elements rounded to `scale` decimals
    * when emitting for cross-engine comparison).
    */
  def l2Normalize(a: Column): Column = {
    val v = toDouble(a)
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    transform(v, x => x / n)
  }

  /** Symmetric int8 quantization: scale by 127/max|x|, round to the
    * nearest integer. Returns array<int> (plus use [[quantizeScale]]
    * to carry the dequantization factor).
    */
  def quantizeInt8(a: Column): Column = {
    val v = toDouble(a)
    val m = quantizeScale(a)
    transform(v, x => round(x * lit(127.0) / m, 0).cast("int"))
  }

  /** max|x| — the dequantization scale for [[quantizeInt8]]. */
  def quantizeScale(a: Column): Column =
    aggregate(toDouble(a), lit(0.0), (acc, x) => greatest(acc, abs(x)))
}
