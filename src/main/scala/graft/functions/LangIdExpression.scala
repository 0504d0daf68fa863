package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID: ONE pass over the token array updates a seen-word
  * bitmask per language profile; the guess is argmax of (distinct stopword
  * hits, language code) with `und` on zero hits — exactly the semantics of
  * the composed `greatest(struct(size(array_intersect(toks, words)), lang))`
  * formulation (and of its DuckDB oracle), but without re-walking the token
  * array once per language or building an intersection hash set per row.
  *
  * Profiles are baked at construction: token → packed (langIdx, wordBit)
  * entries (a stopword may belong to several languages).
  */
object LangIdOps {
  /** langs sorted ascending (the tie-break order) + per-token membership. */
  final class Profiles(profileMap: Map[String, Seq[String]]) extends Serializable {
    val langs: Array[UTF8String] =
      profileMap.keys.toArray.sorted.map(UTF8String.fromString)
    private val langIdx = profileMap.keys.toArray.sorted.zipWithIndex.toMap
    /** token → packed entries (langIdx << 8 | wordBit). */
    val membership: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, scala.collection.mutable.ArrayBuffer[Int]]()
      profileMap.foreach { case (lang, words) =>
        val li = langIdx(lang)
        words.zipWithIndex.foreach { case (w, wi) =>
          m.computeIfAbsent(UTF8String.fromString(w),
            _ => scala.collection.mutable.ArrayBuffer[Int]()) += ((li << 8) | wi)
        }
      }
      val out = new java.util.HashMap[UTF8String, Array[Int]](m.size() * 2)
      m.forEach((k, v) => out.put(k, v.toArray))
      out
    }
    val und: UTF8String = UTF8String.fromString("und")
  }

  def langId(tokens: ArrayData, p: Profiles): UTF8String = {
    val masks = new Array[Int](p.langs.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val entries = p.membership.get(tokens.getUTF8String(i))
        if (entries != null) {
          var j = 0
          while (j < entries.length) {
            masks(entries(j) >> 8) |= 1 << (entries(j) & 0xFF)
            j += 1
          }
        }
      }
      i += 1
    }
    // argmax(score, lang): langs ascend, so >= on equal score keeps the
    // later language code — same tie-break as greatest(struct(score, lang)).
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < masks.length) {
      val s = Integer.bitCount(masks(l))
      if (s > 0 && s >= bestScore) { best = l; bestScore = s }
      l += 1
    }
    if (best < 0) p.und else p.langs(best)
  }
}

case class LangIdExpression(child: Expression, profiles: Map[String, Seq[String]])
  extends UnaryExpression {

  @transient private lazy val compiled = new LangIdOps.Profiles(profiles)

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any =
    LangIdOps.langId(input.asInstanceOf[ArrayData], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langProfiles", compiled,
      classOf[LangIdOps.Profiles].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdOps.langId($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpression =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
}

object LangIdFunctions {
  /** Fused language guess over a token-array column. */
  def lang_id(tokens: Column, profiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(LangIdExpression(ColumnBridge.expression(tokens), profiles))
}
