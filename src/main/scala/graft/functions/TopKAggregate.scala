package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: at most `k` (score, id) entries, ordered by
  * (score desc, id asc). The scale-critical property is the BOUND — as the
  * partial-aggregation buffer of [[TopKByScore]], each map task ships at most
  * k entries per group key, so a per-query top-k over a 10⁹-row corpus
  * shuffles `numPartitions × k` rows per query instead of the 10⁹ scored rows
  * a `row_number().over(Window.partitionBy(query))` plan would (the window
  * puts the ENTIRE corpus in one partition per query).
  *
  * Inserts are O(1) for non-qualifying candidates (one compare against the
  * cached worst) and O(k) when the buffer improves — across n candidates the
  * expected total is O(n + k·log(n)·k).
  *
  * `distinctIds` additionally dedupes by id, keeping the max score per id
  * (for multi-probe LSH / multi-cell IVF where a neighbor reaches a query
  * through several buckets) — this replaces a whole dropDuplicates shuffle.
  */
final class TopKBuffer(val k: Int, val distinctIds: Boolean) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var count = 0
  private var worst = -1 // index of the worst kept entry; valid iff count == k

  /** (s1,i1) ranks strictly ahead of (s2,i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def recomputeWorst(): Unit = {
    var w = 0
    var i = 1
    while (i < count) {
      if (better(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    worst = w
  }

  def insert(s: Double, id: Long): Unit = {
    if (k == 0) return
    // NaN scores never qualify: better() is false in BOTH directions for
    // NaN, which makes the result() comparator intransitive (TimSort
    // throws for arrays >= 32) and would let a meaningless entry squat in
    // a top-k slot while the buffer fills.
    if (java.lang.Double.isNaN(s)) return
    if (distinctIds) {
      // Full buffer + candidate not better than the worst entry: the id
      // cannot be present with a lower score (worst IS the minimum), so
      // the O(count) id scan below is pure waste for the common
      // non-qualifying candidate — reject in O(1) first.
      if (count == k && !better(s, id, scores(worst), ids(worst))) return
      var i = 0
      while (i < count) {
        if (ids(i) == id) {
          if (s > scores(i)) {
            scores(i) = s
            if (count == k && i == worst) recomputeWorst()
          }
          return
        }
        i += 1
      }
    }
    if (count < k) {
      scores(count) = s; ids(count) = id; count += 1
      if (count == k) recomputeWorst()
    } else if (better(s, id, scores(worst), ids(worst))) {
      scores(worst) = s; ids(worst) = id
      recomputeWorst()
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.count) {
      insert(other.scores(i), other.ids(i))
      i += 1
    }
  }

  /** Entries as array<struct<score,id>> sorted by (score desc, id asc). */
  def result(): GenericArrayData = {
    val idx = Array.range(0, count).sortWith { (a, b) =>
      better(scores(a), ids(a), scores(b), ids(b))
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i))): Any
    })
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + count * 16)
    buf.putInt(count)
    var i = 0
    while (i < count) {
      buf.putDouble(scores(i)); buf.putLong(ids(i))
      i += 1
    }
    buf.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte], k: Int, distinctIds: Boolean): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new TopKBuffer(k, distinctIds)
    var i = 0
    while (i < n) {
      b.insert(buf.getDouble(), buf.getLong())
      i += 1
    }
    b
  }
}

/** Per-group bounded top-k as a typed imperative aggregate: partial buffers
  * on the map side hold ≤ k entries, so the exchange is k-bounded per
  * (task, group) — the scalable replacement for the per-group
  * `row_number()` window top-k whose exchange is corpus-sized.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, distinctIds)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val id = idExpr.eval(input)
      if (id != null) buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = buffer.result()

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(bytes, k, distinctIds)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

object TopKByScore {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** array<struct<score,id>> of the top `k` rows per group, ordered by
    * (score desc, id asc); `distinctIds` keeps max score per id.
    */
  def topk_by_score(score: Column, id: Column, k: Int,
      distinctIds: Boolean = false): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id),
        k, distinctIds).toAggregateExpression())
}

/** [[TopKBuffer]] with a double payload riding each (score, id) entry —
  * for caps that select by one key (a deterministic draw) but must hand a
  * DIFFERENT value (a cosine) to the next stage without a join back into
  * the pair table (the join-back measured ~1.6× the whole uncapped query
  * at sf1: it re-shuffles the full pair mass a second time).
  */
final class TopKPayloadBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private val payloads = new Array[Double](k)
  private var count = 0
  private var worst = -1

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def recomputeWorst(): Unit = {
    var w = 0
    var i = 1
    while (i < count) {
      if (better(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    worst = w
  }

  def insert(s: Double, id: Long, p: Double): Unit = {
    if (k == 0) return
    if (java.lang.Double.isNaN(s)) return // see TopKBuffer.insert
    if (count < k) {
      scores(count) = s; ids(count) = id; payloads(count) = p; count += 1
      if (count == k) recomputeWorst()
    } else if (better(s, id, scores(worst), ids(worst))) {
      scores(worst) = s; ids(worst) = id; payloads(worst) = p
      recomputeWorst()
    }
  }

  def mergeFrom(other: TopKPayloadBuffer): Unit = {
    var i = 0
    while (i < other.count) {
      insert(other.scores(i), other.ids(i), other.payloads(i))
      i += 1
    }
  }

  /** array<struct<score,id,payload>> sorted by (score desc, id asc). */
  def result(): GenericArrayData = {
    val idx = Array.range(0, count).sortWith { (a, b) =>
      better(scores(a), ids(a), scores(b), ids(b))
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i), payloads(i))): Any
    })
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + count * 24)
    buf.putInt(count)
    var i = 0
    while (i < count) {
      buf.putDouble(scores(i)); buf.putLong(ids(i)); buf.putDouble(payloads(i))
      i += 1
    }
    buf.array()
  }
}

object TopKPayloadBuffer {
  def deserialize(bytes: Array[Byte], k: Int): TopKPayloadBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new TopKPayloadBuffer(k)
    var i = 0
    while (i < n) {
      b.insert(buf.getDouble(), buf.getLong(), buf.getDouble())
      i += 1
    }
    b
  }
}

case class TopKByScorePayload(
    scoreExpr: Expression,
    idExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPayloadBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = scoreExpr
  override def second: Expression = idExpr
  override def third: Expression = payloadExpr
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScorePayload.resultType
  override def prettyName: String = "topk_by_score_payload"

  override def createAggregationBuffer(): TopKPayloadBuffer =
    new TopKPayloadBuffer(k)

  override def update(buffer: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val id = idExpr.eval(input)
      val p = payloadExpr.eval(input)
      if (id != null && p != null)
        buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long],
          p.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: TopKPayloadBuffer, other: TopKPayloadBuffer): TopKPayloadBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKPayloadBuffer): Any = buffer.result()

  override def serialize(buffer: TopKPayloadBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TopKPayloadBuffer =
    TopKPayloadBuffer.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScorePayload =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScorePayload =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScorePayload =
    copy(scoreExpr = newFirst, idExpr = newSecond, payloadExpr = newThird)
}

object TopKByScorePayload {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", DoubleType, nullable = false))),
    containsNull = false)

  /** array<struct<score,id,payload>> of the top `k` rows per group,
    * ordered by (score desc, id asc), each carrying its payload.
    */
  def topk_by_score_payload(score: Column, id: Column, payload: Column,
      k: Int): Column =
    ColumnBridge.column(
      TopKByScorePayload(ColumnBridge.expression(score),
        ColumnBridge.expression(id), ColumnBridge.expression(payload),
        k).toAggregateExpression())
}
