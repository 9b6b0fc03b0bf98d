package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Dedup signature kernels as native expressions.
  *
  * Both signatures are per-ROW loops over a hash array. Expressed as
  * higher-order-function lambdas they cost one interpreted closure
  * invocation per (element × permutation/bit) — ~50M invocations at
  * sf0.1 dominated the dedup queries. A native eval is one JVM call per
  * row with a tight primitive loop (and stays codegen-friendly through
  * the static-call defineCodeGen, like the other graft expressions).
  */
object SigOps {

  /** numPerm-wide MinHash signature over a hash array. The permutation
    * family is the same chain SQL `xxhash64(h, j)` produces: seed 42 →
    * fold children left to right with XXH64.hashLong.
    */
  def minhash(sh: ArrayData, numPerm: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Long](numPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val seeded = XXH64.hashLong(sh.getLong(i), 42L)
      var j = 0
      while (j < numPerm) {
        val v = XXH64.hashLong(j.toLong, seeded)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct xxhash64 values of every n-codepoint window of a
    * string, computed over the raw UTF-8 bytes: a window's bytes are
    * exactly the concatenation of its codepoints, so values equal
    * `xxhash64(concat(c_i..c_{i+n-1}))` (seed 42) over a split("")
    * array — without materializing the char array or any per-gram
    * string. Strings shorter than n codepoints hash as one whole-string
    * gram.
    */
  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var cnt = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) cnt += 1; i += 1 }
    val offs = new Array[Int](cnt + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(cnt) = len
    val ng = if (cnt >= n) cnt - n + 1 else 1
    val out = new Array[Long](ng)
    if (cnt >= n) {
      i = 0
      while (i < ng) {
        out(i) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + offs(i), offs(i + n) - offs(i), 42L)
        i += 1
      }
    } else {
      out(0) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, 42L)
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < ng) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == ng) out else java.util.Arrays.copyOf(out, w))
  }

  /** Positional xxhash64 values of every n-word window of a string
    * (words = maximal runs of non-\s bytes, same token boundaries as
    * `split(text, '\\s+')`; the hashed bytes are the window's words
    * joined by single spaces, so values equal
    * `xxhash64(concat_ws(' ', w_i..w_{i+n-1}))` with seed 42). Fewer
    * than n words → empty. One scratch buffer per row, no per-window
    * allocation.
    */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    @inline def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
    var w = 0
    var i = 0
    var inWord = false
    while (i < len) {
      if (!isWs(bytes(i))) { if (!inWord) w += 1; inWord = true }
      else inWord = false
      i += 1
    }
    if (w < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](w)
    val ends = new Array[Int](w)
    var k = 0
    i = 0
    inWord = false
    while (i < len) {
      if (!isWs(bytes(i))) {
        if (!inWord) { starts(k) = i; k += 1 }
        inWord = true
      } else {
        if (inWord) ends(k - 1) = i
        inWord = false
      }
      i += 1
    }
    if (inWord) ends(k - 1) = len
    val buf = new Array[Byte](len + n) // upper bound on any window's bytes
    val out = new Array[Long](w - n + 1)
    i = 0
    while (i <= w - n) {
      var p = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val wl = ends(i + j) - starts(i + j)
        System.arraycopy(bytes, starts(i + j), buf, p, wl)
        p += wl
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, p, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection: sorted distinct minima of every w-wide sliding
    * window over a positional hash array (windows clamp at the tail; an
    * array shorter than w yields its single global min).
    */
  def winnowSelect(g: ArrayData, w: Int): ArrayData = {
    val ng = g.numElements()
    if (ng == 0) return new GenericArrayData(Array.emptyLongArray)
    val nw = math.max(ng - w + 1, 1)
    val out = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, ng)
      while (j < end) { val v = g.getLong(j); if (v < m) m = v; j += 1 }
      out(i) = m
      i += 1
    }
    java.util.Arrays.sort(out)
    var wr = 0
    i = 0
    while (i < nw) {
      if (i == 0 || out(i) != out(i - 1)) { out(wr) = out(i); wr += 1 }
      i += 1
    }
    new GenericArrayData(if (wr == nw) out else java.util.Arrays.copyOf(out, wr))
  }

  /** The quality-score stopword list (shared with the t_quality oracle
    * SQL — keep in sync).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "for", "on", "with", "as")
  private val StopwordBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes("UTF-8")).toArray

  /** (n_words, stop_hits) in one pass over the UTF-8 bytes: tokens are
    * \s+ runs; a token counts as a stopword hit when it equals a list
    * entry after ASCII case-folding (the list is pure ASCII, so this
    * matches `lower(text)` tokenization for any input).
    */
  def wordStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    @inline def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
    var nw = 0L
    var sh = 0L
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        nw += 1
        val wl = i - start
        var k = 0
        var hit = false
        while (k < StopwordBytes.length && !hit) {
          val sw = StopwordBytes(k)
          if (sw.length == wl) {
            var j = 0
            var eq = true
            while (eq && j < wl) {
              var b = bytes(start + j)
              if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
              if (b != sw(j)) eq = false
              j += 1
            }
            hit = eq
          }
          k += 1
        }
        if (hit) sh += 1
      }
    }
    new GenericInternalRow(Array[Any](nw, sh))
  }

  // ---- md5-derived hashes (cross-engine reproducible) ----
  //
  // xxhash64 is JVM-specific, so signatures built on it can't be
  // re-derived by the DuckDB oracle. These variants hash with MD5 —
  // identical in every engine — truncated to the first 15 hex nibbles
  // (60 bits), which a SQL oracle reconstructs exactly as
  // `list_reduce(nibbles_of(md5(s))[1:15], (a,b) -> a*16+b)`.

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes[off, off+len)) as a non-negative long:
    * big-endian first 8 digest bytes >>> 4 (== the integer the first 15
    * hex chars spell in base 16).
    */
  def md5Hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest): Array[Byte] = {
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    out
  }

  /** Content-defined chunking (gear-style): a cut lands AFTER every
    * `w`-codepoint window whose md5-60 ≡ 0 (mod `mod`) — expected
    * chunk length ≈ `mod` codepoints. Emits (start, len) in
    * CODEPOINTS (so a SQL substr re-derives the same slices) plus the
    * chunk's md5-hex fingerprint over its UTF-8 bytes. Boundaries
    * depend only on local content, so an edit reshapes chunks in its
    * neighborhood ONLY — the CDC property fixed-stride blocks lack.
    * Strings shorter than `w` are one whole chunk; empty strings
    * chunk to nothing.
    */
  def cdcChunks(s: UTF8String, w: Int, mod: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var cnt = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) cnt += 1; i += 1 }
    if (cnt == 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](cnt + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(cnt) = len
    val md = md5Local.get()
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    def emit(end: Int): Unit = if (end > start) {
      md.reset()
      md.update(bytes, offs(start), offs(end) - offs(start))
      rows += new GenericInternalRow(Array[Any](start, end - start,
        UTF8String.fromBytes(md5Hex(md))))
      start = end
    }
    i = 0
    while (i + w <= cnt) {
      if (java.lang.Long.remainderUnsigned(
          md5Hash60(bytes, offs(i), offs(i + w) - offs(i)), mod) == 0)
        emit(i + w)
      i += 1
    }
    emit(cnt)
    new GenericArrayData(rows.toArray)
  }

  /** Positional md5-60 hashes of every n-word window (same token
    * boundaries and single-space joining as [[wordShingles]]).
    */
  def wordShinglesMd5(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    @inline def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
    var w = 0
    var i = 0
    var inWord = false
    while (i < len) {
      if (!isWs(bytes(i))) { if (!inWord) w += 1; inWord = true }
      else inWord = false
      i += 1
    }
    if (w < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](w)
    val ends = new Array[Int](w)
    var k = 0
    i = 0
    inWord = false
    while (i < len) {
      if (!isWs(bytes(i))) {
        if (!inWord) { starts(k) = i; k += 1 }
        inWord = true
      } else {
        if (inWord) ends(k - 1) = i
        inWord = false
      }
      i += 1
    }
    if (inWord) ends(k - 1) = len
    val buf = new Array[Byte](len + n)
    val out = new Array[Long](w - n + 1)
    i = 0
    while (i <= w - n) {
      var p = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val wl = ends(i + j) - starts(i + j)
        System.arraycopy(bytes, starts(i + j), buf, p, wl)
        p += wl
        j += 1
      }
      out(i) = md5Hash60(buf, 0, p)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct md5-60 hashes of every n-codepoint window (same
    * window contract as [[charGrams]]: shorter strings hash whole).
    */
  def charGramsMd5(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var cnt = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) cnt += 1; i += 1 }
    val offs = new Array[Int](cnt + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(cnt) = len
    val ng = if (cnt >= n) cnt - n + 1 else 1
    val out = new Array[Long](ng)
    if (cnt >= n) {
      i = 0
      while (i < ng) {
        out(i) = md5Hash60(bytes, offs(i), offs(i + n) - offs(i))
        i += 1
      }
    } else {
      out(0) = md5Hash60(bytes, 0, len)
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < ng) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == ng) out else java.util.Arrays.copyOf(out, w))
  }

  /** Order-sensitive md5-hex chain over the \s+ tokens of a string:
    * fp = fold(tokens, "seed") { (acc, w) => md5hex(acc + "|" + w) }.
    * The SQL-oracle twin is
    * `list_reduce(list_prepend('seed', tokens), (a, b) -> md5(a || '|' || b))`.
    */
  def md5ChainFp(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    @inline def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
    val md = md5Local.get()
    var acc = "seed".getBytes("US-ASCII")
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        md.reset()
        md.update(acc)
        md.update('|'.toByte)
        md.update(bytes, start, i - start)
        acc = md5Hex(md)
      }
    }
    UTF8String.fromBytes(acc)
  }

  /** Per-doc character histogram → (n_chars, n_distinct, entropy) in
    * ONE codepoint scan — replaces the explode-per-character → hash agg
    * → window-sum → re-agg plan (one Generate row per character and a
    * per-doc window sort, the suite's most expensive row shape). The
    * entropy terms accumulate in INCREASING CODEPOINT ORDER, which a
    * SQL oracle reproduces exactly with
    * `-list_reduce(list(p*ln(p) ORDER BY ch), +)` (binary collation ==
    * codepoint order == UTF-8 byte order) — the summation order is part
    * of the contract, not an engine accident (a hash-agg SUM's order is
    * not guaranteed across partitionings). ASCII counts live in a flat
    * 128-slot array (the hot path); anything else goes to a TreeMap
    * that iterates in codepoint order after it.
    */
  /** Span-cut accounting for d_substring_apply: given a doc's words
    * and the (unordered) start positions of its CUT span-windows, one
    * linear sweep computes (removed_words, removed_chars, total_chars)
    * — a word at index i is removed iff some cut start p satisfies
    * p ≤ i ≤ p + span − 1. The HOF form (`exists` per word over the
    * cut array) is O(words × cuts) per doc — quadratic on a long
    * fully-duplicated doc (10k words ⇒ 10⁸ probes); this is
    * O(words + cuts·log cuts), the sort being the only super-linear
    * term.
    */
  def spanCutStats(words: ArrayData, cuts: ArrayData, span: Int): InternalRow = {
    val n = words.numElements()
    val m = cuts.numElements()
    val starts = new Array[Int](m)
    var j = 0
    while (j < m) { starts(j) = cuts.getInt(j); j += 1 }
    java.util.Arrays.sort(starts)
    var rw = 0L
    var rc = 0L
    var tc = 0L
    var coveredEnd = -1
    var i = 0
    j = 0
    while (i < n) {
      while (j < m && starts(j) <= i) {
        val e = starts(j) + span - 1
        if (e > coveredEnd) coveredEnd = e
        j += 1
      }
      val len = words.getUTF8String(i).numChars().toLong
      tc += len
      if (i <= coveredEnd) { rw += 1L; rc += len }
      i += 1
    }
    new GenericInternalRow(Array[Any](rw, rc, tc))
  }

  def charEntropy(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.TreeMap[Integer, Array[Long]] = null
    var total = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.TreeMap()
        val a = other.get(cp)
        if (a == null) other.put(cp, Array(1L)) else a(0) += 1
      }
    }
    var nd = 0L
    var acc = 0.0
    val tot = total.toDouble
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0) { nd += 1; val p = cnt.toDouble / tot; acc += p * math.log(p) }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val cnt = it.next()(0)
        nd += 1
        val p = cnt.toDouble / tot
        acc += p * math.log(p)
      }
    }
    new GenericInternalRow(Array[Any](total, nd, -acc))
  }

  /** Deterministic BPE-style subword tokenizer: greedy longest-match
    * against a fixed md5-derived vocabulary, with single-codepoint byte
    * fallback — the shape of a merge-free tokenizer pass (vocab lookup,
    * longest-match, fallback), with the vocab itself a pure function so
    * any engine (and the SQL oracle) rebuilds it bit-for-bit instead of
    * shipping a vocab file.
    *
    * Vocab: over the 37-char domain [a-z0-9 ], a trigram g is a token
    * iff the first hex nibble of md5("bpe:" + g) < '4' (1/4 of
    * trigrams), a bigram iff its nibble < '8' (1/2 of bigrams). Every
    * single codepoint (domain or not) is a token — byte fallback.
    * Greedy scan at codepoint position p: take the trigram if in
    * vocab, else the bigram, else one codepoint. Both vocab tables are
    * precomputed once per JVM (37^3 + 37^2 md5s).
    */
  private val BpeDomain = 37 // [a-z 0-9 space]
  @inline private def bpeIdx(cp: Int): Int =
    if (cp >= 'a' && cp <= 'z') cp - 'a'
    else if (cp >= '0' && cp <= '9') 26 + (cp - '0')
    else if (cp == ' ') 36
    else -1
  private def bpeChar(i: Int): Char =
    if (i < 26) ('a' + i).toChar else if (i < 36) ('0' + (i - 26)).toChar else ' '
  private lazy val (bpeVocab3, bpeVocab2): (Array[Boolean], Array[Boolean]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def nibble(g: String): Int = {
      md.reset()
      (md.digest(("bpe:" + g).getBytes("UTF-8"))(0) >>> 4) & 0xF
    }
    val v3 = new Array[Boolean](BpeDomain * BpeDomain * BpeDomain)
    val v2 = new Array[Boolean](BpeDomain * BpeDomain)
    var a = 0
    while (a < BpeDomain) {
      var b = 0
      while (b < BpeDomain) {
        v2(a * BpeDomain + b) =
          nibble(s"${bpeChar(a)}${bpeChar(b)}") < 8
        var c = 0
        while (c < BpeDomain) {
          v3((a * BpeDomain + b) * BpeDomain + c) =
            nibble(s"${bpeChar(a)}${bpeChar(b)}${bpeChar(c)}") < 4
          c += 1
        }
        b += 1
      }
      a += 1
    }
    (v3, v2)
  }

  /** Greedy longest-match token count of a string under the md5 vocab
    * (see above). One codepoint scan per row.
    */
  def bpeTokenCount(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    // codepoint domain indices (surrogate pairs collapse to one slot)
    var cnt = 0
    var i = 0
    while (i < n) { cnt += 1; i += Character.charCount(str.codePointAt(i)) }
    val dom = new Array[Int](cnt)
    i = 0
    var k = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      dom(k) = bpeIdx(cp)
      k += 1
      i += Character.charCount(cp)
    }
    val v3 = bpeVocab3
    val v2 = bpeVocab2
    var pos = 0
    var tok = 0L
    while (pos < cnt) {
      val d0 = dom(pos)
      if (d0 >= 0 && pos + 3 <= cnt && dom(pos + 1) >= 0 && dom(pos + 2) >= 0 &&
        v3((d0 * BpeDomain + dom(pos + 1)) * BpeDomain + dom(pos + 2))) pos += 3
      else if (d0 >= 0 && pos + 2 <= cnt && dom(pos + 1) >= 0 &&
        v2(d0 * BpeDomain + dom(pos + 1))) pos += 2
      else pos += 1
      tok += 1L
    }
    tok
  }

  /** 64-bit SimHash over a token-hash array: per-bit majority vote. */
  def simhash(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** array<bigint> hash set → numPerm-wide MinHash signature. */

case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.minhash(a.asInstanceOf[ArrayData], numPerm)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.minhash($c, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → sorted distinct xxhash64 values of its n-codepoint windows. */
case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_gram_hashes"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.charGrams(a.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.charGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → struct(n_words, stop_hits) in one byte scan. */
case class WordStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("sh", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_stats"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.wordStats(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.wordStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<string> words, array<int> cut starts) → struct(rw = removed
  * words, rc = removed chars, tc = total word chars) in one linear
  * sweep (see SigOps.spanCutStats for why not a per-word `exists`).
  */
case class SpanCutStats(left: Expression, right: Expression, span: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("rw", LongType, nullable = false),
    StructField("rc", LongType, nullable = false),
    StructField("tc", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_cut_stats"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    SigOps.spanCutStats(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], span)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigOps.spanCutStats($a, $b, $span)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** string → struct(nc = total chars, nd = distinct chars, ent =
  * Shannon entropy of the char distribution) in one codepoint scan.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("nc", LongType, nullable = false),
    StructField("nd", LongType, nullable = false),
    StructField("ent", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.charEntropy(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → greedy longest-match subword token count under the
  * deterministic md5-built vocab (SigOps.bpeTokenCount).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.bpeTokenCount(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.bpeTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → positional xxhash64 values of its n-word windows. */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.wordShingles(a.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** positional hash array → sorted distinct sliding-window minima. */
case class WinnowSelect(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_select"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.winnowSelect(a.asInstanceOf[ArrayData], window)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.winnowSelect($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → positional md5-60 hashes of its n-word windows. */
case class WordShingleMd5Hashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_md5_hashes"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.wordShinglesMd5(a.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.wordShinglesMd5($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → content-defined chunks array<struct<start,len,fp>> (see
  * [[SigOps.cdcChunks]]).
  */
case class CdcChunks(child: Expression, w: Int, mod: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("fp", org.apache.spark.sql.types.StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.cdcChunks(a.asInstanceOf[UTF8String], w, mod)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.cdcChunks($c, $w, $mod)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → sorted distinct md5-60 hashes of its n-codepoint windows. */
case class CharGramMd5Hashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_gram_md5_hashes"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.charGramsMd5(a.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.charGramsMd5($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string → md5-hex chain fingerprint over its \s+ tokens. */
case class Md5ChainFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_chain_fp"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.md5ChainFp(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.md5ChainFp($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<bigint> token hashes → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(a: Any): Any =
    SigOps.simhash(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
