package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gale–Church-style sentence alignment (Gale & Church 1993), integerized:
  * the bitext DP that turns a mined document pair into aligned sentence
  * segments. Segment operations carry the PUBLISHED match priors (their
  * −100·ln p table: 1–1 = 0, insertion/deletion = 450, 2–1/1–2 = 230,
  * 2–2 = 440 centinats) plus an integerized first-order length cost —
  * the δ²/2 term of the paper's normal model with variance ∝ mean
  * segment length, floored:
  *
  *   cost_len(la, lb) = 15·(la − lb)² // (la + lb + 1)
  *
  * (15 ≈ 100 / (6.8·(la+lb)/((la+lb)/1)) folded — the quadratic shape and
  * the 6.8 chars-of-variance-per-char constant are the paper's; the tail
  * beyond the quadratic term is dropped so every cell is exact int64 and
  * any engine replays the DP bit-for-bit). Ties break by the FIXED op
  * preference order 1–1, 1–0, 0–1, 2–1, 1–2, 2–2, making the argmin path
  * unique and the ops string deterministic.
  *
  * Inputs longer than `maxSentences` are truncated (production aligners
  * chunk long documents; the cap also bounds the oracle's wavefront
  * unroll). Output: (n_a, n_b, total_cost, n_segments, ops) with ops a
  * comma-joined "da-db" path, e.g. "1-1,2-1,1-0".
  */
object GaleChurchOps {
  /** (da, db, prior) in tie-preference order. */
  private val Ops: Array[(Int, Int, Long)] = Array(
    (1, 1, 0L), (1, 0, 450L), (0, 1, 450L),
    (2, 1, 230L), (1, 2, 230L), (2, 2, 440L))

  @inline private def lenCost(la: Long, lb: Long): Long = {
    val d = la - lb
    15L * d * d / (la + lb + 1L)
  }

  def align(a: ArrayData, b: ArrayData, maxSentences: Int): InternalRow = {
    val na = math.min(a.numElements(), maxSentences)
    val nb = math.min(b.numElements(), maxSentences)
    val la = Array.tabulate(na)(i =>
      if (a.isNullAt(i)) 0L else a.getUTF8String(i).numChars().toLong)
    val lb = Array.tabulate(nb)(i =>
      if (b.isNullAt(i)) 0L else b.getUTF8String(i).numChars().toLong)
    val INF = Long.MaxValue / 4
    val cost = Array.fill(na + 1, nb + 1)(INF)
    val from = Array.fill(na + 1, nb + 1)(-1)
    cost(0)(0) = 0L
    var i = 0
    while (i <= na) {
      var j = 0
      while (j <= nb) {
        if (cost(i)(j) < INF) {
          var o = 0
          while (o < Ops.length) {
            val (da, db, prior) = Ops(o)
            val ni = i + da
            val nj = j + db
            if (ni <= na && nj <= nb) {
              var sa = 0L
              var k = i
              while (k < ni) { sa += la(k); k += 1 }
              var sb = 0L
              k = j
              while (k < nj) { sb += lb(k); k += 1 }
              val c = cost(i)(j) + prior + lenCost(sa, sb)
              // Strict < : earlier (i, j) cells and earlier ops win ties,
              // so the argmin path is unique.
              if (c < cost(ni)(nj)) { cost(ni)(nj) = c; from(ni)(nj) = o }
            }
            o += 1
          }
        }
        j += 1
      }
      i += 1
    }
    // Backtrack the unique path.
    val ops = scala.collection.mutable.ListBuffer.empty[String]
    var ci = na
    var cj = nb
    while (ci > 0 || cj > 0) {
      val o = from(ci)(cj)
      val (da, db, _) = Ops(o)
      ops.prepend(s"$da-$db")
      ci -= da
      cj -= db
    }
    new GenericInternalRow(Array[Any](na, nb,
      if (na == 0 && nb == 0) 0L else cost(na)(nb),
      ops.length, UTF8String.fromString(ops.mkString(","))))
  }
}

case class GaleChurchAlign(left: Expression, right: Expression,
    maxSentences: Int) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", IntegerType, nullable = false),
    StructField("n_b", IntegerType, nullable = false),
    StructField("total_cost", LongType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    StructField("ops", StringType, nullable = false)))
  override def prettyName: String = "gale_church_align"

  override def nullSafeEval(a: Any, b: Any): Any =
    GaleChurchOps.align(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      maxSentences)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GaleChurchOps.align($a, $b, $maxSentences)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GaleChurchAlign =
    copy(left = newLeft, right = newRight)
}

/** Token-sequence LCS — the core of ROUGE-L contamination scoring: the
  * longest common subsequence of two token arrays (each truncated to
  * `maxTokens`, the [[GaleChurchOps]] capping convention — production
  * scorers chunk long documents, and the cap bounds the oracle's
  * wavefront unroll). The classic O(n·m) row-rolling DP, all-int,
  * deterministic; the classical recurrence (match → diag+1, else
  * max(up, left)) equals the full three-way max, which is what the
  * diagonal-unrolled SQL replay computes — both are THE unique LCS
  * length. Output struct: (n_a, n_b, lcs) with n_a/n_b the TRUNCATED
  * lengths the score is defined over.
  */
object TokenLcsOps {
  def lcs(a: ArrayData, b: ArrayData, maxTokens: Int): InternalRow = {
    val na = math.min(a.numElements(), maxTokens)
    val nb = math.min(b.numElements(), maxTokens)
    val as = Array.tabulate(na)(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i))
    val bs = Array.tabulate(nb)(i =>
      if (b.isNullAt(i)) null else b.getUTF8String(i))
    val dp = new Array[Int](nb + 1)
    var i = 1
    while (i <= na) {
      var prevDiag = 0
      var j = 1
      while (j <= nb) {
        val up = dp(j)
        val eq = as(i - 1) != null && bs(j - 1) != null &&
          as(i - 1).equals(bs(j - 1))
        dp(j) = if (eq) prevDiag + 1 else math.max(up, dp(j - 1))
        prevDiag = up
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](na, nb, dp(nb)))
  }
}

case class TokenLcs(left: Expression, right: Expression, maxTokens: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", IntegerType, nullable = false),
    StructField("n_b", IntegerType, nullable = false),
    StructField("lcs", IntegerType, nullable = false)))
  override def prettyName: String = "token_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenLcsOps.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TokenLcsOps.lcs($a, $b, $maxTokens)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcs =
    copy(left = newLeft, right = newRight)
}

object AlignFunctions {
  /** Gale–Church-style DP alignment struct (see [[GaleChurchOps]]). */
  def gale_church_align(sentsA: Column, sentsB: Column,
      maxSentences: Int = 10): Column =
    ColumnBridge.column(GaleChurchAlign(ColumnBridge.expression(sentsA),
      ColumnBridge.expression(sentsB), maxSentences))

  /** Token-LCS struct (n_a, n_b, lcs) — see [[TokenLcsOps]]. */
  def token_lcs(toksA: Column, toksB: Column, maxTokens: Int = 16): Column =
    ColumnBridge.column(TokenLcs(ColumnBridge.expression(toksA),
      ColumnBridge.expression(toksB), maxTokens))
}
