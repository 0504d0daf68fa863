package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over a token array: 64-bit signature whose Hamming distance
  * approximates cosine similarity of the token multisets. Native expression
  * (not a UDF) so the per-token × per-bit loop runs as one tight call inside
  * whole-stage codegen.
  */
object SimHash {
  /** Full 64-bit hash of the token's BYTES (catalyst's XXH64, the same
    * kernel behind SQL `xxhash64`). Seeding from the 32-bit
    * `UTF8String.hashCode` would cap the family at 2^32 distinct values —
    * on a large vocabulary the birthday-bound token collisions (expected
    * from ~2^16 distinct tokens) inflate minhash/simhash similarity
    * estimates.
    */
  def hashToken(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9E3779B97F4A7C15L)

  /** Position-salted remix of an already-hashed token. */
  @inline def hashToken2(h: Long, pos: Int): Long = {
    var x = h ^ (pos.toLong * 0xC4CEB9FE1A85EC53L + 0x165667B19E3779F9L)
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^ (x >>> 29)
  }

  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

}

/** Distinct k-shingle hashes straight from the token array — combines the
  * per-token hashes positionally instead of materializing each shingle as a
  * concatenated string and hashing that (the string build dominated the
  * shingle pipeline's profile). Short docs (< k tokens) hash their whole
  * token sequence as one shingle, mirroring TextAnalysis.shingles.
  */
object ShingleOps {
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val tokenHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHashes(i) = if (tokens.isNullAt(i)) 0L else SimHash.hashToken(tokens.getUTF8String(i))
      i += 1
    }
    // 0 tokens -> 0 shingles: a shared phantom gram for every EMPTY doc
    // would cross-match all of them (and poison Bloom decontamination /
    // novelty scoring). Short NON-empty docs (< k tokens) still hash the
    // whole sequence as one shingle, per the contract above.
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val count = math.max(1, n - k + 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new ArrayBuffer(count)
    var s = 0
    while (s < count) {
      var h = 0x9E3779B97F4A7C15L
      var j = s
      val end = math.min(n, s + k)
      while (j < end) {
        h = java.lang.Long.rotateLeft(h, 13) ^ SimHash.hashToken2(tokenHashes(j), j - s)
        j += 1
      }
      h = MinHash.mix(h, 0L)
      if (seen.add(h)) out += h
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.result())
  }

  private final class ArrayBuffer(initial: Int) {
    private var arr = new Array[Long](math.max(4, initial))
    private var len = 0
    def +=(v: Long): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(len) = v; len += 1
    }
    def result(): Array[Long] = java.util.Arrays.copyOf(arr, len)
  }
}

/** Winnowing document fingerprints (the MOSS construction, Schleimer et al.
  * 2003, public): the ordered sequence of k-gram rolling hashes is reduced to
  * the minimum of each sliding window of `w` consecutive hashes (rightmost
  * wins ties), and the distinct selected minima are the fingerprint set. Any
  * shared substring of length ≥ w + k − 1 tokens between two documents is
  * guaranteed to share a fingerprint — the locality property plain sampling
  * lacks. One fused pass: token hashes → positional k-gram combine (same
  * kernel as [[ShingleOps]]) → deque sliding minimum.
  */
object WinnowOps {
  def fingerprints(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val tokenHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHashes(i) = if (tokens.isNullAt(i)) 0L else SimHash.hashToken(tokens.getUTF8String(i))
      i += 1
    }
    val grams = math.max(1, n - k + 1)
    val gram = new Array[Long](grams)
    var s = 0
    while (s < grams) {
      var h = 0x9E3779B97F4A7C15L
      var j = s
      val end = math.min(n, s + k)
      while (j < end) {
        h = java.lang.Long.rotateLeft(h, 13) ^ SimHash.hashToken2(tokenHashes(j), j - s)
        j += 1
      }
      gram(s) = MinHash.mix(h, 0L)
      s += 1
    }
    // Sliding-window minimum, rightmost-min per window, distinct selections.
    val win = math.max(1, w)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](grams) // indices, increasing, hashes increasing
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < grams) {
      // Rightmost-wins: evict equal-or-greater hashes from the back.
      while (tail > head && gram(deque(tail - 1)) >= gram(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 || i == grams - 1) seen.add(gram(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowOps.fingerprints(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

}

/** Non-distinct variant of [[ShingleOps.shingleHashes]] for repetition
  * statistics: EVERY k-gram occurrence emits its hash (duplicates are the
  * signal), and fewer-than-k-token docs emit an EMPTY array (an occurrence
  * list, not a fallback set). Shares the positional token-hash combine, so
  * equal grams ⇔ equal hashes (modulo ~1e-10 collisions).
  */
object NgramOps {
  def ngramHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.emptyLongArray)
    val tokenHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHashes(i) = if (tokens.isNullAt(i)) 0L else SimHash.hashToken(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s < out.length) {
      var h = 0x9E3779B97F4A7C15L
      var j = s
      while (j < s + k) {
        h = java.lang.Long.rotateLeft(h, 13) ^ SimHash.hashToken2(tokenHashes(j), j - s)
        j += 1
      }
      out(s) = MinHash.mix(h, 0L)
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

case class NgramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramOps.ngramHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramOps.ngramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)

}

case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

}

/** MinHash signature as ONE fused pass: for each shingle hash, all
  * `numHashes` seeded mixes update their running minima. The equivalent
  * `array((0 until 64).map(i => array_min(transform(sh, h => xxhash64(h, i)))))`
  * composition walks the shingle array 64 times through 64 generated loops —
  * measured 10×+ slower at bench scale.
  */
object MinHash {
  /** Murmur3-style finalizer over (h ^ seed-constant) — a standard public
    * construction for families of pairwise-independent-ish hash functions.
    */
  @inline def mix(h: Long, seed: Long): Long = {
    var x = h ^ (seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L)
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^= (x >>> 33); x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  def signature(shingleHashes: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingleHashes.numElements()
    var i = 0
    while (i < n) {
      if (!shingleHashes.isNullAt(i)) {
        val h = shingleHashes.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = mix(h, s.toLong)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

/** Fused shingle-join + md5-prefix hashing for the portable minhash policy:
  * for each k-gram of the token array, md5 of the space-joined shingle
  * string and the first-13-hex-digit (52-bit) prefix as a long — EXACTLY
  * `conv(substr(md5(g), 1, 13), 16, 10)` per shingle, without materializing
  * the shingle string or the 32-char hex string (the two allocations that
  * dominated the composed form). Joining token UTF-8 bytes with 0x20 is
  * byte-identical to UTF-8-encoding the joined string, so DuckDB's
  * `md5(t[i] || ' ' || ...)` sees the same digest input. Fewer-than-k
  * tokens hash the whole sequence as one shingle (TextAnalysis.shingles
  * contract).
  */
object Md5ShingleOps {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private def prefix52(d: Array[Byte]): Long = {
    // First 13 hex digits = first 6.5 bytes, big-endian nibble order.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  def hashes(tokens: ArrayData, k: Int): ArrayData = {
    val md = digests.get()
    val n = tokens.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (tokens.isNullAt(i)) Array.emptyByteArray
                 else tokens.getUTF8String(i).getBytes
      i += 1
    }
    // Same 0-tokens -> 0-shingles rule as ShingleOps.shingleHashes.
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val count = math.max(1, n - k + 1)
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      md.reset()
      val end = math.min(n, s + k)
      var j = s
      while (j < end) {
        if (j > s) md.update(' '.toByte)
        md.update(bytes(j))
        j += 1
      }
      out(s) = prefix52(md.digest())
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

case class Md5ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    Md5ShingleOps.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleOps.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)

}

/** Fused deterministic token corruption (the mask/drop augmentation draw):
  * per (id, position) the md5-prefix uniform u = first-13-hex-digits / 2^52
  * — EXACTLY `conv(substr(md5(id || '-' || i || '-' || salt), 1, 13), 16,
  * 10) / 2^52`, the [[Md5ShingleOps]] digest policy — decides mask
  * (u < pMask) / drop (pMask ≤ u < pMask + pDrop) / keep in ONE generated
  * loop. The composed HOF form re-ran the interpreted md5 projection per
  * consumer (the thrice-measured no-CSE price); this computes counts and
  * the corrupted text in a single pass with no intermediate struct array.
  */
object AugmentOps {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val saltBytes = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val Mask = UTF8String.fromString("<mask>")
  private val Sep = UTF8String.fromString(" ")

  def augment(id: UTF8String, tokens: ArrayData, pMask: Double, pDrop: Double,
      salt: String): InternalRow = {
    val md = digests.get()
    val tail = saltBytes.computeIfAbsent(salt,
      s => ("-" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val idb = id.getBytes
    val n = tokens.numElements()
    var masked = 0L
    var dropped = 0L
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(idb)
      md.update('-'.toByte)
      md.update(java.lang.Integer.toString(i)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      md.update(tail)
      val d = md.digest()
      // First 13 hex digits = top 52 bits of the first 7 bytes.
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
      val u = (v >>> 4).toDouble / 4503599627370496.0
      if (u < pMask) { masked += 1; kept.add(Mask) }
      else if (u < pMask + pDrop) dropped += 1
      else kept.add(tokens.getUTF8String(i))
      i += 1
    }
    val txt = UTF8String.concatWs(Sep,
      kept.toArray(new Array[UTF8String](kept.size)): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, masked, dropped, txt))
  }
}

/** PORTABLE SimHash (cross-engine verifiable, the PortableMinHash policy
  * applied to simhash): each token occurrence votes with the first 64 bits
  * of md5(token) read MSB-first — bit b is bit (63−b) of the big-endian
  * first-8-digest-bytes value, i.e. exactly what SQL reads from the hex
  * string as `(nibble(substr(md5(tok), b/4+1, 1)) >> (3 − b%4)) & 1`. The
  * signature is emitted as the two 32-bit big-endian halves (sig_hi,
  * sig_lo), both < 2^32, so any engine can assemble them with exact
  * double/BIGINT arithmetic (one 64-bit value would overflow engines
  * without wrapping int64). The fast production family stays [[SimHash]]
  * (XXH64 votes, one long, no md5 cost) — this family exists so the
  * signature CONTENT itself is oracle-replayable bit-for-bit.
  */
object PortableSimHashOps {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def signature(tokens: ArrayData): InternalRow = {
    val md = digests.get()
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        md.reset()
        md.update(t.getBytes)
        val d = md.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((v >>> (63 - b)) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) hi |= 1L << (31 - b); b += 1 }
    while (b < 64) { if (counts(b) > 0) lo |= 1L << (63 - b); b += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hi, lo))
  }
}

case class PortableSimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sig_hi", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sig_lo", LongType, nullable = false)))
  override def prettyName: String = "portable_simhash"

  override def nullSafeEval(input: Any): Any =
    PortableSimHashOps.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableSimHashOps.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)

}

/** Unicode script-mix profile — the mixed-script/homoglyph audit a spam
  * and quality pass runs (Cyrillic 'о' inside Latin words, zero-width
  * padding, CJK boilerplate in an "English" crawl): one codepoint walk
  * classifying characters into EXPLICIT ranges — Latin (ASCII letters +
  * U+00C0–U+024F minus × ÷), Cyrillic U+0400–U+04FF, Greek
  * U+0370–U+03FF, CJK (unified ideographs + kana + hangul syllables),
  * Arabic U+0600–U+06FF, ASCII digits, other — with ASCII whitespace
  * (9–13, 32) excluded from the mass. The ranges ARE the contract
  * (deliberately not Character.UnicodeScript, whose tables shift by JDK
  * version and exist in no SQL engine): any engine replays them from
  * codepoint arithmetic. mixed = ≥ 2 letter scripts present.
  */
object ScriptProfileOps {
  def profile(text: UTF8String): InternalRow = {
    val s = text.toString
    var latin, cyr, greek, cjk, arabic, digit, other, n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val ws = (cp >= 0x9 && cp <= 0xD) || cp == 0x20
      if (!ws) {
        n += 1
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= 0xC0 && cp <= 0x24F && cp != 0xD7 && cp != 0xF7))
          latin += 1
        else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
        else if (cp >= 0x370 && cp <= 0x3FF) greek += 1
        else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
            (cp >= 0x3040 && cp <= 0x30FF) ||
            (cp >= 0xAC00 && cp <= 0xD7AF)) cjk += 1
        else if (cp >= 0x600 && cp <= 0x6FF) arabic += 1
        else if (cp >= '0' && cp <= '9') digit += 1
        else other += 1
      }
    }
    var nScripts = 0
    Seq(latin, cyr, greek, cjk, arabic).foreach(c => if (c > 0) nScripts += 1)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, latin, cyr, greek, cjk, arabic, digit, other,
        nScripts, if (nScripts >= 2) 1 else 0))
  }
}

case class ScriptProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq("n_chars", "latin", "cyrillic", "greek", "cjk", "arabic", "digit",
      "other").map(f =>
      org.apache.spark.sql.types.StructField(f, LongType, nullable = false)) ++
    Seq("n_scripts", "mixed").map(f =>
      org.apache.spark.sql.types.StructField(f,
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "script_profile"

  override def nullSafeEval(input: Any): Any =
    ScriptProfileOps.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptProfileOps.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)

}

/** Fused md5 pair draw: the 52-bit md5-prefix of "a-b-salt" as a long —
  * EXACTLY `conv(substr(md5(concat(a, '-', b, '-', salt)), 1, 13), 16,
  * 10)` without materializing the concat string, the 32-char hex string,
  * or conv's decimal string (four allocations per row on a pair table
  * that can run to 10⁷+ rows).
  */
object Md5PairDrawOps {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val saltBytes = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  def draw(a: Long, b: Long, salt: String): Long = {
    val md = digests.get()
    val tail = saltBytes.computeIfAbsent(salt,
      s => ("-" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.reset()
    md.update(java.lang.Long.toString(a)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update('-'.toByte)
    md.update(java.lang.Long.toString(b)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(tail)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}

case class Md5PairDraw(left: Expression, right: Expression, salt: String)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_pair_draw"

  override def nullSafeEval(a: Any, b: Any): Any =
    Md5PairDrawOps.draw(a.asInstanceOf[Long], b.asInstanceOf[Long], salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Md5PairDrawOps.draw($a, $b, $saltRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5PairDraw =
    copy(left = newLeft, right = newRight)
}

case class AugmentTokensExpr(left: Expression, right: Expression,
    pMask: Double, pDrop: Double, salt: String) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_masked", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_dropped", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("aug_text",
      org.apache.spark.sql.types.StringType, nullable = false)))
  override def prettyName: String = "augment_tokens"

  override def nullSafeEval(idv: Any, tks: Any): Any =
    AugmentOps.augment(idv.asInstanceOf[UTF8String],
      tks.asInstanceOf[ArrayData], pMask, pDrop, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.AugmentOps.augment($a, $b, $pMask, $pDrop, $saltRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AugmentTokensExpr =
    copy(left = newLeft, right = newRight)
}

/** The PORTABLE minhash policy (cross-engine verifiable): position hash p of
  * a 52-bit md5-prefix shingle hash v is (aₚ·h₁ + bₚ·h₂ + cₚ) mod (2^31−1)
  * with h₁ = low 26 bits, h₂ = high 26 bits — 2-universal, and plain
  * non-wrapping integer arithmetic any SQL engine can replay (unlike the
  * XXH64 family above). The coefficient stream is a fixed splitmix-style
  * recurrence, NOT runtime randomness, so the DuckDB oracle generator
  * derives the identical family. Fused one-pass minima like [[MinHash]] —
  * the composed 64×zip_with form allocates an intermediate array per
  * position and measured ~6× slower end-to-end.
  */
object PortableMinHash {
  val Prime: Long = 2147483647L // 2^31 − 1: a·h₁ + b·h₂ + c < 2^58, overflow-free

  /** Flattened (a, b, c) per position, memoized per family size. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def coeffsFor(numHashes: Int): Array[Long] =
    cache.computeIfAbsent(numHashes, { n =>
      val out = new Array[Long](3 * n)
      var x = 0x5DEECE66DL
      var i = 0
      while (i < out.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        out(i) = ((x >>> 33) % (Prime - 1)) + 1
        i += 1
      }
      out
    })

  def signature(hs: ArrayData, numHashes: Int): ArrayData = {
    val co = coeffsFor(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val v = hs.getLong(i)
        val h1 = v & 0x3FFFFFFL
        val h2 = v >>> 26
        var s = 0
        while (s < numHashes) {
          val x = (co(3 * s) * h1 + co(3 * s + 1) * h2 + co(3 * s + 2)) % Prime
          if (x < mins(s)) mins(s) = x
          s += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

case class PortableMinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_signature"

  override def nullSafeEval(input: Any): Any =
    PortableMinHash.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableMinHash.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSignature =
    copy(child = newChild)

}

case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

}

/** Fused tokenizer: lowercase once, then one byte-scan splitting on runs of
  * ASCII whitespace — drop-in identical to
  * `filter(split(lower(text), "\s+"), _ != "")` (Java `\s` =
  * `[ \t\n\x0B\f\r]`, all single-byte, and UTF-8 continuation bytes can
  * never collide with ASCII, so the byte scan is Unicode-safe). The composed
  * form runs the regex engine per row and materializes empty-string
  * artifacts; this feeds the shingle/minhash pipelines, which made it the
  * profile-dominant scalar stage.
  */
object TokenizeOps {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def tokens(text: UTF8String): ArrayData = {
    val lower = text.toLowerCase
    val n = lower.numBytes()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(lower.getByte(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(lower.getByte(i))) i += 1
        val b = new Array[Byte](i - start)
        var j = 0
        while (j < i - start) { b(j) = lower.getByte(start + j); j += 1 }
        out.add(UTF8String.fromBytes(b))
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[UTF8String](out.size())))
  }
}

/** Unicode NFC normalization kernel. ASCII bytes are already NFC, so the
  * fast path is a byte scan that returns the INPUT object untouched (no
  * copy, no `String` round-trip) — on mostly-ASCII corpora the expression
  * is nearly free; only rows that actually carry non-ASCII pay the
  * `java.text.Normalizer` cost (and of those, already-normalized strings
  * skip the rebuild via `isNormalized`).
  */
object NormalizeOps {
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a string column (codegen'd; see
  * [[NormalizeOps.nfc]] for the ASCII fast path). The standard first step
  * of text cleanup before hashing/dedup — byte-different encodings of the
  * same visible text (é vs e+◌́) otherwise defeat exact and near dedup.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

}

case class Tokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any =
    TokenizeOps.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeOps.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)

}

/** Exact Jaccard of two distinct-element long arrays (shingle-hash sets):
  * |∩| / (|a| + |b| - |∩|) in one membership pass — hash the smaller side,
  * probe with the larger. The `array_intersect`/`array_union` composition
  * builds two hash sets AND materializes the union array per pair; this is
  * the hot verify kernel of ngram-Jaccard dedup, so it gets the fused form.
  * Inputs must be duplicate-free (ShingleHashes emits distinct hashes).
  */
object JaccardOps {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    if (na == 0 || nb == 0) return 0.0
    val (small, big) = if (na <= nb) (a, b) else (b, a)
    val ns = small.numElements()
    val set = new java.util.HashSet[java.lang.Long](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var inter = 0
    val nbg = big.numElements()
    i = 0
    while (i < nbg) {
      if (set.contains(big.getLong(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

case class JaccardSets(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sets"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardOps.jaccard($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSets =
    copy(left = l, right = r)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null else nullSafeEval(a, b)
  }
}

/** Cosine similarity of two float-array embeddings as a native expression —
  * a single fused dot/norm loop per row (the `aggregate`/`zip_with` composition
  * allocates intermediate arrays; this doesn't).
  */
object VectorOps {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}

/** PQ asymmetric-distance (ADC) accumulation: given a row's m packed
  * subspace codes and the query's per-subspace dot-product lookup table
  * (m × ksub floats, flattened), the query·reconstruction dot product is
  *
  *   base + Σ_j lut[j·ksub + unsigned(codes[j])]
  *
  * (`base` carries the query·coarse-center term for IVF-PQ residual codes;
  * 0 for plain PQ). One table add per subspace, no vector materialization —
  * this is the innermost loop of PQ search (FAISS IndexPQ/IndexIVFPQ's
  * ADC), fused into whole-stage codegen.
  */
object VectorOps2 {
  def adcScore(codes: Array[Byte], lut: ArrayData, base: Double, ksub: Int): Double = {
    var s = base
    var j = 0
    val m = codes.length
    while (j < m) {
      s += lut.getFloat(j * ksub + (codes(j) & 0xFF))
      j += 1
    }
    s
  }
}

case class PqAdcScore(
    first: Expression,
    second: Expression,
    third: Expression,
    ksub: Int) extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(codes: Any, lut: Any, base: Any): Any =
    VectorOps2.adcScore(codes.asInstanceOf[Array[Byte]],
      lut.asInstanceOf[ArrayData], base.asInstanceOf[Double], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l, b) =>
      s"graft.functions.VectorOps2.adcScore($c, $l, $b, $ksub)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqAdcScore =
    copy(first = f, second = s, third = t)

  override def eval(input: InternalRow): Any = {
    val c = first.eval(input)
    val l = second.eval(input)
    val b = third.eval(input)
    if (c == null || l == null || b == null) null else nullSafeEval(c, l, b)
  }
}

case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null else nullSafeEval(a, b)
  }
}

/** Character-level n-gram repetition statistics (Gopher §A1.1, Rae et al.
  * 2021): one O(m) pass per document computing, for word n-grams,
  *
  *   - `top_mass`   — the largest (occurrence count × character length) of
  *     any n-gram: the char mass of the dominant repeated phrase (on count
  *     ties this takes the larger mass, a deterministic variant of "chars
  *     in the most frequent n-gram" that needs no gram-order tiebreak);
  *   - `dup_cover_chars` — characters of token positions covered by ANY
  *     n-gram occurring ≥ 2 times (the "fraction of characters inside
  *     duplicated n-grams" numerator);
  *   - `total_chars` — Σ token characters, the shared denominator.
  *
  * Counting is over 64-bit gram hashes ([[NgramOps]]'s family — equal
  * grams ⇔ equal hashes modulo ~1e-10 collisions); coverage is an interval
  * sweep, so everything is integer-exact and an independent engine
  * rebuilding the same grams from strings reproduces the values bit-for-bit.
  */
object RepetitionOps {
  def profile(tokens: ArrayData, n: Int): InternalRow = {
    val m = tokens.numElements()
    val prefix = new Array[Long](m + 1)
    var i = 0
    while (i < m) {
      val len = if (tokens.isNullAt(i)) 0 else tokens.getUTF8String(i).numChars()
      prefix(i + 1) = prefix(i) + len
      i += 1
    }
    val total = prefix(m)
    if (m < n)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](total, 0L, 0L))
    val grams = NgramOps.ngramHashes(tokens, n)
    val g = grams.numElements()
    // Open-addressing hash map: slot -> (gram hash, count, char length).
    var cap = 1
    while (cap < 2 * g) cap <<= 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    val glens = new Array[Long](cap)
    val slotOf = new Array[Int](g)
    var s = 0
    while (s < g) {
      val h = grams.getLong(s)
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      while (counts(idx) != 0 && keys(idx) != h) idx = (idx + 1) & (cap - 1)
      if (counts(idx) == 0) {
        keys(idx) = h
        glens(idx) = prefix(s + n) - prefix(s)
      }
      counts(idx) += 1
      slotOf(s) = idx
      s += 1
    }
    var topMass = 0L
    var idx = 0
    while (idx < cap) {
      if (counts(idx) > 0) {
        val mass = counts(idx).toLong * glens(idx)
        if (mass > topMass) topMass = mass
      }
      idx += 1
    }
    // Interval sweep over duplicated-gram spans [s, s+n).
    var covChars = 0L
    var coveredUntil = 0
    s = 0
    while (s < g) {
      if (counts(slotOf(s)) >= 2) {
        val lo = math.max(s, coveredUntil)
        if (lo < s + n) covChars += prefix(s + n) - prefix(lo)
        coveredUntil = s + n
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, topMass, covChars))
  }
}

case class RepetitionProfile(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = RepetitionProfile.resultType
  override def prettyName: String = "repetition_profile"

  override def nullSafeEval(input: Any): Any =
    RepetitionOps.profile(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionOps.profile($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)

}

object RepetitionProfile {
  val resultType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_mass", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup_cover_chars", LongType, nullable = false)))
}

object TextFunctions {
  /** 64-bit simhash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Distinct k-shingle hashes from a token-array column (fused, no string
    * materialization). */
  def shingle_hashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))

  /** Fused minhash signature (array<long>) of a shingle-hash array column. */
  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingleHashes), numHashes))

  /** Fused PORTABLE-policy minhash signature over md5-prefix shingle hashes
    * (see [[PortableMinHash]] — SQL-replayable linear family).
    */
  def portable_minhash_signature(md5PrefixHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      PortableMinHashSignature(ColumnBridge.expression(md5PrefixHashes), numHashes))

  /** Fused shingle-join + 52-bit md5-prefix hashes of a token array
    * (see [[Md5ShingleOps]] — the portable policy's shingle hash).
    */
  def md5_shingle_hashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(Md5ShingleHashes(ColumnBridge.expression(tokens), k))

  /** Unicode script-mix profile struct (see [[ScriptProfileOps]]). */
  def script_profile(text: Column): Column =
    ColumnBridge.column(ScriptProfile(ColumnBridge.expression(text)))

  /** Fused 52-bit md5 pair draw (see [[Md5PairDrawOps]]). */
  def md5_pair_draw(a: Column, b: Column, salt: String): Column =
    ColumnBridge.column(Md5PairDraw(ColumnBridge.expression(a),
      ColumnBridge.expression(b), salt))

  /** Portable md5-vote SimHash halves (see [[PortableSimHashOps]]):
    * (sig_hi, sig_lo) struct, each the big-endian 32-bit half.
    */
  def portable_simhash(tokens: Column): Column =
    ColumnBridge.column(PortableSimHash(ColumnBridge.expression(tokens)))

  /** Fused deterministic mask/drop token corruption (see [[AugmentOps]]):
    * (n_tokens, n_masked, n_dropped, aug_text) struct in one pass.
    */
  def augment_tokens(id: Column, tokens: Column, pMask: Double,
      pDrop: Double, salt: String): Column =
    ColumnBridge.column(AugmentTokensExpr(ColumnBridge.expression(id),
      ColumnBridge.expression(tokens), pMask, pDrop, salt))

  /** Cosine similarity of two array<float> columns. */
  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PQ ADC dot product: binary codes column × flattened (m·ksub)
    * array<float> lookup-table column (+ a double base term).
    */
  def pq_adc_score(codes: Column, lut: Column, base: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), ColumnBridge.expression(base), ksub))

  /** Exact Jaccard of two distinct-long-array columns (fused single pass). */
  def jaccard_sets(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSets(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused lowercase-whitespace tokenizer (array<string>). */
  def tokenize(text: Column): Column =
    ColumnBridge.column(Tokenize(ColumnBridge.expression(text)))

  /** Unicode NFC normalization (ASCII fast path, no-copy). */
  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** NON-distinct k-gram occurrence hashes (repetition statistics). */
  def ngram_hashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(NgramHashes(ColumnBridge.expression(tokens), k))

  /** Winnowing fingerprints (distinct window-min rolling k-gram hashes). */
  def winnow_fingerprints(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokens), k, w))

  /** Character-level n-gram repetition stats (see [[RepetitionOps]]). */
  def repetition_profile(tokens: Column, n: Int): Column =
    ColumnBridge.column(RepetitionProfile(ColumnBridge.expression(tokens), n))
}
