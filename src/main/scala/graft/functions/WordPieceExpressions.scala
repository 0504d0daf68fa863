package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation (the WordPiece / MaxMatch
  * inference rule — Wu et al. 2016 §4.1; the encode half of a trained
  * subword tokenizer, next to [[graft.ops.Bpe]]'s merge-rule trainer):
  * repeatedly strip the LONGEST vocabulary piece prefixing the remaining
  * word; when no piece matches, emit `unk` and advance one character.
  * Per word the loop is capped at `maxPieces` emitted pieces (any
  * remainder beyond the cap is dropped — a documented bound, unreachable
  * for natural word lengths with a single-character fallback vocab).
  *
  * The rule is a pure function of (word, vocab), so a SQL oracle replays
  * it by unrolling the step loop: each step's "longest prefixing piece"
  * is an `ORDER BY len DESC LIMIT 1` over the vocabulary literal.
  *
  * The piece trie is compiled once per expression instance (the
  * [[AhoCorasickOps]] lazy-per-executor pattern); matching walks the trie
  * once per position, tracking the deepest terminal — O(|word|) per
  * greedy step, no per-row allocation beyond the output.
  */
object MaxMatchOps {

  /** Executor-global compile cache + readResolve canonicalization — the
    * full [[AhoCorasickOps]] pattern, not just its lazy-trie half: plan
    * reference objects deserialize once per TASK, so without the cache a
    * 30k-piece vocab re-sorted and re-built its trie in every task (the
    * same ~17×-build pathology AhoCorasickOps measured and fixed).
    */
  private val compileCache = new java.util.concurrent.ConcurrentHashMap[
    (Seq[String], String, Int), Segmenter]()
  def compiled(vocab: Seq[String], unk: String, maxPieces: Int): Segmenter =
    compileCache.computeIfAbsent(
      (vocab.distinct.sorted.toVector, unk, maxPieces),
      { case (v, u, m) => new Segmenter(v, u, m) })

  final class Segmenter(vocabIn: Seq[String], val unk: String,
      val maxPieces: Int) extends Serializable {
    require(vocabIn.nonEmpty, "vocabulary must not be empty")
    require(vocabIn.forall(_.nonEmpty), "vocabulary pieces must be non-empty")
    require(maxPieces >= 1, "maxPieces must be >= 1")
    val vocab: Array[String] = vocabIn.distinct.sorted.toArray

    private def readResolve(): Object =
      MaxMatchOps.compiled(scala.collection.immutable.ArraySeq
        .unsafeWrapArray(vocab), unk, maxPieces)

    // Child-map trie with a terminal flag per node.
    @transient private lazy val trie: (Array[java.util.HashMap[Character, Integer]], Array[Boolean]) = {
      val kids = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val term = scala.collection.mutable.ArrayBuffer(false)
      vocab.foreach { p =>
        var node = 0
        p.foreach { ch =>
          val nxt = kids(node).get(ch)
          node = if (nxt != null) nxt.intValue()
          else {
            kids += new java.util.HashMap[Character, Integer]()
            term += false
            kids(node).put(ch, kids.length - 1)
            kids.length - 1
          }
        }
        term(node) = true
      }
      (kids.toArray, term.toArray)
    }

    /** Length of the longest vocab piece prefixing `s` from `from`; 0 if none. */
    private def longestAt(s: String, from: Int): Int = {
      val (kids, term) = trie
      var node = 0
      var best = 0
      var i = from
      while (i < s.length) {
        val nxt = kids(node).get(s.charAt(i))
        if (nxt == null) return best
        node = nxt.intValue()
        if (term(node)) best = i - from + 1
        i += 1
      }
      best
    }

    /** Greedy segmentation of one word. */
    def pieces(word: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var pos = 0
      var n = 0
      while (pos < word.length && n < maxPieces) {
        val len = longestAt(word, pos)
        if (len > 0) {
          out += word.substring(pos, pos + len)
          pos += len
        } else {
          out += unk
          pos += 1
        }
        n += 1
      }
      out.result()
    }
  }

  def encode(toks: ArrayData, seg: Segmenter): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      if (t != null) seg.pieces(t.toString)
        .foreach(p => out += UTF8String.fromString(p))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `maxmatch_pieces(tokens)` — greedy longest-match subword pieces of every
  * token, concatenated in order. See [[MaxMatchOps]].
  */
case class MaxMatchPieces(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", maxPieces: Int = 24)
  extends UnaryExpression {

  @transient private lazy val compiled =
    MaxMatchOps.compiled(vocab, unk, maxPieces)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "maxmatch_pieces"

  override def nullSafeEval(input: Any): Any =
    MaxMatchOps.encode(input.asInstanceOf[ArrayData], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxMatchSeg", compiled,
      classOf[MaxMatchOps.Segmenter].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.MaxMatchOps.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxMatchPieces =
    copy(child = newChild)

}

object WordPieceFunctions {
  /** Greedy longest-match subword pieces over a token-array column. */
  def maxmatch_pieces(toks: Column, vocab: Seq[String],
      unk: String = "[UNK]", maxPieces: Int = 24): Column =
    ColumnBridge.column(MaxMatchPieces(ColumnBridge.expression(toks), vocab,
      unk, maxPieces))
}
