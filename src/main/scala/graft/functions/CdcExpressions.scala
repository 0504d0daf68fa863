package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused content-defined chunking kernel for
  * [[graft.ops.Dedup.cdcChunks]]: one pass over the token array computes
  * every cut decision (md5 of the k-gram string ending at each position,
  * mod `modulus`) and every chunk's identity hash (md5 of the chunk's
  * token string), emitting array<struct<st, ln, h>>.
  *
  * The composed Column form ran the cut test as a higher-order `filter`
  * lambda — HOFs never enter whole-stage codegen, so every position paid
  * an interpreted Column tree building a concat_ws string plus a
  * catalyst md5 call. The HASH POLICY is unchanged (md5 hex of the
  * space-joined lowercase tokens — the engine's cross-engine-replayable
  * choice, DuckDB oracles depend on it); only the evaluation is fused.
  */
object CdcOps {
  private val hexDigits = "0123456789abcdef".toCharArray

  // One digest per thread, like every other md5 kernel in this package
  // (Md5ShingleOps/AugmentOps/Md5PairDrawOps): getInstance per call is a
  // synchronized JCA lookup and this kernel runs once per token position.
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex(bytes: Array[Byte]): String = {
    val m = md5.get()
    m.reset()
    val d = m.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = hexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Space-joined UTF-8 bytes of tokens[from .. until-1]. */
  private def joinBytes(toks: Array[Array[Byte]], from: Int, until: Int): Array[Byte] = {
    var len = 0
    var i = from
    while (i < until) { len += toks(i).length; i += 1 }
    len += math.max(0, until - from - 1)
    val out = new Array[Byte](len)
    var pos = 0
    i = from
    while (i < until) {
      if (i > from) { out(pos) = ' '; pos += 1 }
      System.arraycopy(toks(i), 0, out, pos, toks(i).length)
      pos += toks(i).length
      i += 1
    }
    out
  }

  /** First 13 hex chars of the digest as a base-16 long (the engine's
    * `pmod(conv(substring(md5(g), 1, 13), 16, 10), m)` policy — 52 bits,
    * always non-negative).
    */
  private def cutKey(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(0, 13), 16)

  def chunkStructs(tokens: ArrayData, k: Int, modulus: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      i += 1
    }
    // Cut AFTER position j (j in [k-1, n-2]) when the k-gram ending at j
    // hashes to 0 mod modulus; a cut after the last token would open an
    // empty chunk and is skipped (mirrors the composed form's j < n-1).
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var j = k - 1
    while (j <= n - 2) {
      val key = cutKey(md5Hex(joinBytes(toks, j - k + 1, j + 1)))
      if (key % modulus == 0) starts += (j + 1)
      j += 1
    }
    val rows = new Array[Any](starts.length)
    i = 0
    while (i < starts.length) {
      val s = starts(i)
      val e = if (i + 1 < starts.length) starts(i + 1) else n
      rows(i) = InternalRow(s, e - s,
        UTF8String.fromString(md5Hex(joinBytes(toks, s, e))))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

case class CdcChunkStructs(child: Expression, k: Int, modulus: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("st", IntegerType, nullable = false),
      StructField("ln", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunk_structs"

  override def nullSafeEval(input: Any): Any =
    CdcOps.chunkStructs(input.asInstanceOf[ArrayData], k, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcOps.chunkStructs($c, $k, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkStructs =
    copy(child = newChild)

}

object CdcFunctions {
  def cdc_chunk_structs(tokens: Column, k: Int, modulus: Int): Column =
    ColumnBridge.column(CdcChunkStructs(ColumnBridge.expression(tokens), k, modulus))
}

/** Integerized unigram-entropy kernel for
  * [[graft.ops.TextAnalysis.docEntropy]]: ONE hash-count pass per row, no
  * shuffle. Policy (engine-replayable): with L = token count and c_t the
  * per-distinct-term counts,
  *
  *   s        = Σ_t round(10⁶ · c_t · ln c_t)   (int64 after per-term round)
  *   entropy  = round(10⁶ · ln L) − s DIV L     (exact ints from there)
  *
  * which is 10⁶·H for H = ln L − (1/L)·Σ c ln c, the Shannon entropy of
  * the token distribution in nats. Rounding is half-away-from-zero on
  * non-negative arguments (floor(x + 0.5)), matching SQL ROUND.
  */
object EntropyOps {
  def tokenEntropy(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    if (n == 0) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    var total = 0L
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        counts.merge(t, 1, (a, b) => a + b)
        total += 1L
      }
      i += 1
    }
    if (total == 0L) return InternalRow(0L, 0L, 0L)
    var s = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      s += math.floor(1e6 * c * math.log(c.toDouble) + 0.5).toLong
    }
    val ent = math.floor(1e6 * math.log(total.toDouble) + 0.5).toLong - s / total
    InternalRow(total, counts.size().toLong, ent)
  }
}

case class TokenEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_scaled", LongType, nullable = false)))
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(input: Any): Any =
    EntropyOps.tokenEntropy(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EntropyOps.tokenEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)

}

object EntropyFunctions {
  def token_entropy(tokens: Column): Column =
    ColumnBridge.column(TokenEntropy(ColumnBridge.expression(tokens)))
}
