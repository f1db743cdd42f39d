package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ops.LinearClassifier
import graft.ops.LinearClassifier.PerceptronModel

/** Streaming classifier gate (B17) — the continuous twin of C99's
  * serving path: documents arrive as a stream (a live crawl), and
  * every micro-batch keeps only the docs the fitted model accepts,
  * appending survivors (with their margins, for later calibration)
  * to the training corpus.
  *
  * The model compiles ONCE into the gate as a weight-array literal;
  * the batch body is [[LinearClassifier.scoreText]] — one narrow
  * codegen'd projection, no explode, no aggregation, NO STATE. Like
  * B15, statelessness is what makes replay trivially correct: a
  * reprocessed batch appends identical rows and downstream exact
  * dedup (B9) collapses them. The accepted stream provably equals
  * batch scoring over the same documents (spec).
  */
object StreamingScorer {

  final class Gate private[StreamingScorer] (
      model: PerceptronModel, dim: Int, minMargin: Long) {

    /** Batch body: docs whose integer margin exceeds the threshold
      * (strict >, matching pred's `margin > 0` convention at
      * minMargin=0). Token-less docs score bias-only and are dropped
      * unless the bias alone clears the threshold. Pure
      * filter-on-projection — no join, no exchange of any kind.
      */
    def accept(batch: DataFrame, text: Column): DataFrame =
      batch
        .withColumn("margin", LinearClassifier.marginExpr(text, dim, model))
        .filter(col("margin") > minMargin)
  }

  def gate(model: PerceptronModel, dim: Int, minMargin: Long = 0L): Gate =
    new Gate(model, dim, minMargin)

  /** Wire a streaming document source through the gate, appending
    * accepted rows (+margin) to `acceptedPath`. Caller sets
    * checkpoint and starts.
    */
  def writer(docs: DataFrame, textCol: String,
      g: Gate, acceptedPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        g.accept(batch, col(textCol))
          .write.mode("append").parquet(acceptedPath)
      }
}
