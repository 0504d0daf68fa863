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
  // Executor-global compile caches + readResolve canonicalization (the
  // AhoCorasickOps pattern): both profile objects ship as plan reference
  // objects and deserialize once per TASK — without the memo every task
  // rebuilt the token/gram hash maps from scratch.
  private val profilesCache = new java.util.concurrent.ConcurrentHashMap[
    Map[String, Seq[String]], Profiles]()
  def compiledProfiles(m: Map[String, Seq[String]]): Profiles =
    profilesCache.computeIfAbsent(m, mm => new Profiles(mm))
  /** langs sorted ascending (the tie-break order) + per-token membership. */
  final class Profiles(val profileMap: Map[String, Seq[String]]) extends Serializable {
    private def readResolve(): Object = LangIdOps.compiledProfiles(profileMap)
    val langs: Array[UTF8String] =
      profileMap.keys.toArray.sorted.map(UTF8String.fromString)
    private val langIdx = profileMap.keys.toArray.sorted.zipWithIndex.toMap
    /** token → packed entries (langIdx << 8 | wordBit). */
    val membership: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, scala.collection.mutable.ArrayBuffer[Int]]()
      profileMap.foreach { case (lang, words) =>
        val li = langIdx(lang)
        // Dedup first (a repeated profile word must not earn two bits —
        // the contract is size(array_intersect)), then bound by the mask
        // width: `1L << wi` is a Long shift, so anything past 64 would
        // silently alias word 0's bit and miscount.
        val distinctWords = words.distinct
        require(distinctWords.size <= 64,
          s"language profile '$lang' has ${distinctWords.size} distinct " +
            "words; lang_id packs word hits into a 64-bit mask")
        distinctWords.zipWithIndex.foreach { case (w, wi) =>
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
    val masks = new Array[Long](p.langs.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val entries = p.membership.get(tokens.getUTF8String(i))
        if (entries != null) {
          var j = 0
          while (j < entries.length) {
            masks(entries(j) >> 8) |= 1L << (entries(j) & 0xFF)
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
      val s = java.lang.Long.bitCount(masks(l))
      if (s > 0 && s >= bestScore) { best = l; bestScore = s }
      l += 1
    }
    if (best < 0) p.und else p.langs(best)
  }
}

case class LangIdExpression(child: Expression, profiles: Map[String, Seq[String]])
  extends UnaryExpression {

  @transient private lazy val compiled = LangIdOps.compiledProfiles(profiles)

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

}

object LangIdFunctions {
  /** Fused language guess over a token-array column. */
  def lang_id(tokens: Column, profiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(LangIdExpression(ColumnBridge.expression(tokens), profiles))

  /** Character-trigram language guess over a raw text column. */
  def ngram_lang_id(text: Column, profiles: Map[String, Seq[(String, Int)]]): Column =
    ColumnBridge.column(NgramLangIdExpression(ColumnBridge.expression(text), profiles))
}

/** Character n-gram language-ID (the cld2/fastText-style public technique,
  * trigram order): normalize the text (lowercase, ASCII-whitespace runs →
  * '_', '_'-padded ends — the [[TokenizeOps.isWs]] whitespace set), slide a
  * 3-CODEPOINT window, and accumulate each matching profile trigram's
  * integer weight into its language's score; the guess is argmax of
  * (score, language code) with `und` on zero score — the same argmax/
  * tie-break convention as [[LangIdExpression]], so the SQL oracle shape
  * is unchanged (score via a profile VALUES join, argmax via
  * list_sort(struct)[-1]).
  *
  * Why trigrams beat whole-token stopword matching: function-word
  * character patterns survive inflection ("einem"/"einer" carry "_ei"/
  * "ein"), punctuation attachment ("les," still yields "_le"/"les"), and
  * short texts that contain no complete stopword token — the three
  * failure modes the stopword method's spec fixtures demonstrate.
  *
  * Determinism/oracle parity: windows slide over CODEPOINTS (DuckDB
  * `substr` semantics), normalization is exactly
  * `'_' || regexp_replace(lower(text), '\s+', '_', 'g') || '_'`, and
  * weights are integer counts — no floating point anywhere.
  */
object NgramLangIdOps {
  // Executor-global compile cache (see LangIdOps above for why).
  private val nProfilesCache = new java.util.concurrent.ConcurrentHashMap[
    Map[String, Seq[(String, Int)]], NProfiles]()
  def compiledNProfiles(m: Map[String, Seq[(String, Int)]]): NProfiles =
    nProfilesCache.computeIfAbsent(m, mm => new NProfiles(mm))

  final class NProfiles(val profileMap: Map[String, Seq[(String, Int)]])
      extends Serializable {
    private def readResolve(): Object = NgramLangIdOps.compiledNProfiles(profileMap)
    val langs: Array[UTF8String] =
      profileMap.keys.toArray.sorted.map(UTF8String.fromString)
    private val langIdx = profileMap.keys.toArray.sorted.zipWithIndex.toMap
    /** packed 3-codepoint key → packed (langIdx << 20 | weight) entries. */
    val weights: java.util.HashMap[java.lang.Long, Array[Int]] = {
      val m = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Int]]()
      profileMap.foreach { case (lang, grams) =>
        val li = langIdx(lang)
        grams.foreach { case (g, w) =>
          val cps = g.codePoints().toArray
          require(cps.length == 3, s"profile gram '$g' is not 3 codepoints")
          require(w > 0 && w < (1 << 20), s"weight $w out of range")
          val key = (cps(0).toLong << 42) | (cps(1).toLong << 21) | cps(2).toLong
          m.computeIfAbsent(key,
            _ => scala.collection.mutable.ArrayBuffer[Int]()) += ((li << 20) | w)
        }
      }
      val out = new java.util.HashMap[java.lang.Long, Array[Int]](m.size() * 2)
      m.forEach((k, v) => out.put(k, v.toArray))
      out
    }
    val und: UTF8String = UTF8String.fromString("und")
  }

  @inline private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Normalized codepoint sequence: '_' + ws-runs→'_' + '_'. */
  private def normalize(lower: String): Array[Int] = {
    val out = new Array[Int](lower.length + 2)
    var n = 0
    out(n) = '_'; n += 1
    var i = 0
    var lastWs = false
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (isWs(cp)) {
        if (!lastWs) { out(n) = '_'; n += 1 }
        lastWs = true
      } else {
        out(n) = cp; n += 1
        lastWs = false
      }
      i += Character.charCount(cp)
    }
    out(n) = '_'; n += 1
    java.util.Arrays.copyOf(out, n)
  }

  def ngramLangId(text: UTF8String, p: NProfiles): UTF8String = {
    val cps = normalize(text.toLowerCase.toString)
    val scores = new Array[Long](p.langs.length)
    var i = 0
    while (i + 2 < cps.length) {
      val key = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      val entries = p.weights.get(key)
      if (entries != null) {
        var j = 0
        while (j < entries.length) {
          scores(entries(j) >>> 20) += entries(j) & 0xFFFFF
          j += 1
        }
      }
      i += 1
    }
    // argmax(score, lang): langs ascend, >= on equal score keeps the later
    // code — identical to greatest(struct(score, lang)) / list_sort [-1].
    var best = -1
    var bestScore = 0L
    var l = 0
    while (l < scores.length) {
      if (scores(l) > 0 && scores(l) >= bestScore) { best = l; bestScore = scores(l) }
      l += 1
    }
    if (best < 0) p.und else p.langs(best)
  }
}

case class NgramLangIdExpression(
    child: Expression, profiles: Map[String, Seq[(String, Int)]])
  extends UnaryExpression {

  @transient private lazy val compiled = NgramLangIdOps.compiledNProfiles(profiles)

  override def dataType: DataType = StringType
  override def prettyName: String = "ngram_lang_id"

  override def nullSafeEval(input: Any): Any =
    NgramLangIdOps.ngramLangId(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramLangProfiles", compiled,
      classOf[NgramLangIdOps.NProfiles].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramLangIdOps.ngramLangId($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramLangIdExpression =
    copy(child = newChild)

}
