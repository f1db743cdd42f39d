package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: keep the k best (score, id)
  * pairs per group, best = highest score with ascending-id tie-break.
  *
  * The scale rationale: the standard `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k` formulation shuffles EVERY row to its
  * group's reducer and sorts the whole group — at 100 TB a
  * per-domain/per-language "best k documents" pass moves the entire
  * corpus through one window sort. This aggregate is a partial-agg
  * citizen instead: each map task maintains a k-element heap per
  * group, the shuffle carries at most k pairs per (task, group), and
  * the reducer merges heaps — shuffle volume drops from O(rows) to
  * O(tasks·k·groups), with no per-group sort (heap insertion is
  * O(log k) against the current worst element).
  *
  * Deterministic under any partitioning/merge order: the kept set is
  * the unique k-smallest in the total order (score desc, id asc) —
  * heap merge order cannot change a set defined by a total order.
  * Eval renders best-first, so `posexplode` yields ranks directly.
  */
object TopKAgg {

  val DefaultK = 10

  /** Worst-kept-first ordering: the priority-queue head is the element
    * the next candidate has to beat (lowest score; among equal scores
    * the highest id, since lower ids win ties).
    */
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val byScore = java.lang.Long.compare(y._1, x._1) // lower score = worse = larger
      if (byScore != 0) byScore else java.lang.Long.compare(x._2, y._2) // higher id = worse
    }
  }

  final class Buffer(val k: Int) {
    val heap = new scala.collection.mutable.PriorityQueue[(Long, Long)]()(worstFirst)
    def offer(score: Long, id: Long): Unit =
      if (heap.size < k) heap.enqueue((score, id))
      else {
        val (ws, wi) = heap.head
        if (score > ws || (score == ws && id < wi)) {
          heap.dequeue()
          heap.enqueue((score, id))
        }
      }
    /** Best-first (score desc, id asc). */
    def result(): Seq[(Long, Long)] = heap.clone().dequeueAll.reverse.toSeq
  }

  def serialize(b: Buffer): Array[Byte] = {
    val entries = b.result()
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * entries.size)
    bb.putInt(b.k)
    bb.putInt(entries.size)
    entries.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => b.offer(bb.getLong, bb.getLong))
    b
  }

  /** Aggregate (score, id) bigint pairs into the group's top-k:
    * array<struct<id, score>> best-first.
    */
  def topK(score: Column, id: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(TopKAggExpr(
      GraftSqlShim.expression(score.cast("bigint")),
      GraftSqlShim.expression(id.cast("bigint")), k).toAggregateExpression())
}

case class TopKAggExpr(
    left: Expression,
    right: Expression,
    k: Int = TopKAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] with BinaryLike[Expression] {

  require(k >= 1, "top-k needs k >= 1")

  private def score: Expression = left
  private def id: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k requires (bigint score, bigint id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buffer: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.result().foreach { case (s, i) => buffer.offer(s, i) }
    buffer
  }

  override def eval(buffer: TopKAgg.Buffer): Any = {
    val rows = buffer.result().map { case (s, i) => InternalRow(i, s) }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(buffer: TopKAgg.Buffer): Array[Byte] = TopKAgg.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = TopKAgg.deserialize(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAggExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_top_k"
}
