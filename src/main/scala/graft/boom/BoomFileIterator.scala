package graft.boom

import java.io.InputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.io.{DatumReader, Decoder}
import org.apache.avro.util.Utf8
import org.apache.spark.unsafe.types.UTF8String

/** One decoded-and-filtered log line. `message` is null when column pruning
  * determined the message isn't needed (its decode is skipped entirely).
  */
final class BoomLine {
  var timestamp: Long = 0L
  var eventId: Int = 0
  var message: UTF8String = _
  var createTime: Long = 0L
  var blockNumber: Long = 0L
  var lineNumber: Long = 0L
}

/** Scan-time pushdown state for a Boom read.
  *
  * @param minTs      inclusive lower bound on line timestamp (epoch ms)
  * @param maxTsExcl  exclusive upper bound
  * @param contains   byte-wise substring terms, ALL of which must appear in the
  *                   message (conjunction of pushed `StringContains` filters)
  * @param needMessage whether the message column must be decoded
  */
final case class BoomPushdown(
    minTs: Long = Long.MinValue,
    maxTsExcl: Long = Long.MaxValue,
    contains: Seq[UTF8String] = Nil,
    needMessage: Boolean = true) extends Serializable {
  def hasTimeFilter: Boolean = minTs != Long.MinValue || maxTsExcl != Long.MaxValue
}

/** Hand-rolled Avro `DatumReader` for `logBlock` records that filters *during*
  * decode:
  *
  *   - blocks whose `second` lies wholly outside the pushed time range have
  *     their line array skipped without materializing strings — the Spark
  *     analogue of the reference's second-granularity block skip
  *     (util/FastSearch.java:266-269, Cat.java:83-84);
  *   - pushed substring terms are tested byte-wise per line before a row is
  *     surfaced — the analogue of FastSearch's scan-before-decode trick
  *     (util/FastSearch.java:215-224), minus a redundant decode pass since we
  *     test on the zero-copy UTF8String;
  *   - when the `message` column is pruned, string decode is skipped.
  *
  * Tolerates writer-schema evolution the same way the reference does
  * (readers pass writer+expected schema, BoomRecordReader.java:82-87): fields
  * are dispatched by name, unknown fields are skipped, and a missing `eventId`
  * defaults to 0.
  *
  * Each `read` returns the (possibly empty) buffer of surviving lines of one
  * logBlock record.
  */
final class BoomBlockDatumReader(pushdown: BoomPushdown)
    extends DatumReader[ArrayBuffer[BoomLine]] {

  private var writerSchema: Schema = BoomSchemas.logBlockSchema
  private var utf8 = new Utf8

  override def setSchema(schema: Schema): Unit = writerSchema = schema

  override def read(reuse: ArrayBuffer[BoomLine], in: Decoder): ArrayBuffer[BoomLine] = {
    val out = if (reuse == null) new ArrayBuffer[BoomLine] else { reuse.clear(); reuse }
    var second = 0L
    var createTime = 0L
    var blockNumber = 0L

    val fields = writerSchema.getFields
    val nFields = fields.size()
    var f = 0
    while (f < nFields) {
      val field = fields.get(f)
      field.name() match {
        case "second" => second = in.readLong()
        case "createTime" => createTime = in.readLong()
        case "blockNumber" => blockNumber = in.readLong()
        case "logLines" =>
          val base = second * 1000L
          // Block-level skip: the block covers [base, base+999].
          val skipAll = pushdown.hasTimeFilter &&
            (base + 999L < pushdown.minTs || base >= pushdown.maxTsExcl)
          val itemSchema = field.schema().getElementType
          if (skipAll) skipLines(in, itemSchema)
          else readLines(in, itemSchema, base, createTime, blockNumber, out)
        case _ => skipByType(in, field.schema())
      }
      f += 1
    }
    out
  }

  private def readLines(
      in: Decoder,
      itemSchema: Schema,
      base: Long,
      createTime: Long,
      blockNumber: Long,
      out: ArrayBuffer[BoomLine]): Unit = {
    val itemFields = itemSchema.getFields
    val nItemFields = itemFields.size()
    var lineNo = 0L
    var n = in.readArrayStart()
    while (n != 0) {
      var i = 0L
      while (i < n) {
        lineNo += 1
        var ms = 0L
        var eventId = 0
        var message: UTF8String = null
        var matched = true
        var f = 0
        while (f < nItemFields) {
          itemFields.get(f).name() match {
            case "ms" => ms = in.readLong()
            case "eventId" => eventId = in.readInt()
            case "message" =>
              val ts = base + ms
              val inRange = ts >= pushdown.minTs && ts < pushdown.maxTsExcl
              if (!inRange) { in.skipString(); matched = false }
              else if (pushdown.needMessage || pushdown.contains.nonEmpty) {
                utf8 = in.readString(utf8)
                // Copy out of the reused buffer only if the line survives.
                message = UTF8String.fromBytes(
                  java.util.Arrays.copyOf(utf8.getBytes, utf8.getByteLength))
                var t = 0
                while (matched && t < pushdown.contains.length) {
                  if (!message.contains(pushdown.contains(t))) matched = false
                  t += 1
                }
              } else in.skipString()
            case _ => skipByType(in, itemFields.get(f).schema())
          }
          f += 1
        }
        if (matched) {
          val line = new BoomLine
          line.timestamp = base + ms
          line.eventId = eventId
          line.message = message
          line.createTime = createTime
          line.blockNumber = blockNumber
          line.lineNumber = lineNo
          out += line
        }
        i += 1
      }
      n = in.arrayNext()
    }
  }

  private def skipLines(in: Decoder, itemSchema: Schema): Unit = {
    val itemFields = itemSchema.getFields
    val nItemFields = itemFields.size()
    var n = in.skipArray()
    while (n != 0) {
      var i = 0L
      while (i < n) {
        var f = 0
        while (f < nItemFields) { skipByType(in, itemFields.get(f).schema()); f += 1 }
        i += 1
      }
      n = in.skipArray()
    }
  }

  private def skipByType(in: Decoder, s: Schema): Unit = s.getType match {
    case Schema.Type.LONG => in.readLong()
    case Schema.Type.INT => in.readInt()
    case Schema.Type.STRING => in.skipString()
    case Schema.Type.BYTES => in.skipBytes()
    case Schema.Type.BOOLEAN => in.readBoolean()
    case Schema.Type.FLOAT => in.readFloat()
    case Schema.Type.DOUBLE => in.readDouble()
    case Schema.Type.NULL => in.readNull()
    case Schema.Type.FIXED => in.skipFixed(s.getFixedSize)
    case other => throw new UnsupportedOperationException(s"Cannot skip $other in Boom file")
  }
}

/** Flat iterator of surviving [[BoomLine]]s over one Boom file stream. */
final class BoomFileIterator(input: InputStream, pushdown: BoomPushdown)
    extends Iterator[BoomLine] with AutoCloseable {

  private val stream =
    new DataFileStream[ArrayBuffer[BoomLine]](input, new BoomBlockDatumReader(pushdown))
  private var buffer: ArrayBuffer[BoomLine] = new ArrayBuffer[BoomLine]
  private var pos = 0

  override def hasNext: Boolean = {
    while (pos >= buffer.length && stream.hasNext) {
      buffer = stream.next(buffer)
      pos = 0
    }
    pos < buffer.length
  }

  override def next(): BoomLine = {
    if (!hasNext) throw new NoSuchElementException
    val l = buffer(pos)
    pos += 1
    l
  }

  override def close(): Unit = stream.close()
}

/** Iterator over one byte-range slice of a Boom file, bounded by Avro sync
  * markers — the mechanism that makes large `.bm` files splittable across
  * tasks (the reference's record readers did the same seek-to-sync:
  * mapreduce/boom/BoomRecordReader.java:93).
  *
  * `sync(start)` seeks to the first sync marker at/after `start`;
  * `pastSync(end)` stops once the reader crosses `end` — together every block
  * is read by exactly one of the non-overlapping slices.
  */
final class BoomFileRangeIterator(
    in: org.apache.avro.file.SeekableInput,
    pushdown: BoomPushdown,
    start: Long,
    end: Long)
    extends Iterator[BoomLine] with AutoCloseable {

  private val reader = new org.apache.avro.file.DataFileReader[ArrayBuffer[BoomLine]](
    in, new BoomBlockDatumReader(pushdown))
  reader.sync(start)
  // Clamp: pastSync(pos) compares against pos + SYNC_SIZE, which overflows
  // for Long.MaxValue ("read to end of file") and would mark everything past.
  private val stop = math.min(end, in.length())
  private var buffer: ArrayBuffer[BoomLine] = new ArrayBuffer[BoomLine]
  private var pos = 0

  override def hasNext: Boolean = {
    while (pos >= buffer.length && reader.hasNext && !reader.pastSync(stop)) {
      buffer = reader.next(buffer)
      pos = 0
    }
    pos < buffer.length
  }

  override def next(): BoomLine = {
    if (!hasNext) throw new NoSuchElementException
    val l = buffer(pos)
    pos += 1
    l
  }

  override def close(): Unit = reader.close()
}
