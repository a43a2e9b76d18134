package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for content-hash expressions (SimHash — SURVEY D2's
  * near-dup family). FNV-1a is public-domain arithmetic; SimHash per
  * Charikar's SIGMOD'02 similarity-estimation scheme.
  */
object HashOps {

  /** Single-pass lowercase whitespace tokenizer — the hot path of
    * every signature kernel; a regex split + String.toLowerCase costs
    * ~10× this on typical documents.
    */
  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else {
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit avalanche finalizer (splitmix64-style) — decorrelates the
    * FNV base hash for double hashing.
    */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature in one pass (SURVEY D2): k min-hashes via the
    * standard double-hashing scheme h_k = h1 + k·h2 over lowercase
    * word shingles. Duplicate shingles don't affect a min, so no
    * distinct-set is materialized. Plain JVM arithmetic — wraparound
    * is intended (hash mixing), no ANSI overflow semantics involved.
    */
  def minhashSignature(
      text: UTF8String,
      numHashes: Int,
      shingleSize: Int): ArrayData = {
    val k = math.max(1, numHashes)
    val sig = Array.fill(k)(Long.MaxValue)
    val words = tokenize(text.toString)
    if (words.nonEmpty) {
      val n = math.max(1, shingleSize)
      val end = math.max(1, words.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < end) {
        sb.setLength(0)
        var j = i
        val stop = math.min(words.length, i + n)
        while (j < stop) {
          if (j > i) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        val h1 = fnv64(sb.toString)
        val h2 = mix64(h1) | 1L
        var h = h1
        var m = 0
        while (m < k) {
          if (h < sig(m)) sig(m) = h
          h += h2
          m += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Positional word n-gram hashes (SURVEY D18): element `i` is the
    * FNV-1a hash of the n-gram starting at word position `i` under RAW
    * single-space splitting — the exact `split(text, ' ')` tokenization
    * (empty words on space runs KEPT, case preserved), so a gram joined
    * with ' ' is the original character span and the hash is computed
    * directly over that span with zero gram-string allocation. Texts
    * with fewer than n words yield an empty array (no whole-text
    * collapse — span detection has nothing to anchor there). One pass,
    * O(len · n) char work in a tight loop.
    */
  def gramHashes(text: UTF8String, n0: Int): ArrayData = {
    val s = text.toString
    val n = math.max(1, n0)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val words = starts.length
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words - n + 1)
    var g = 0
    while (g <= words - n) {
      val a = starts(g)
      // exclusive end: the space before word g+n, or end of string
      val b = if (g + n < words) starts(g + n) - 1 else s.length
      var h = 0xcbf29ce484222325L
      var j = a
      while (j < b) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
      out(g) = java.lang.Long.valueOf(h)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct lowercase word n-shingles in one pass (order of first
    * occurrence). Short texts (< n words) collapse to one whole-text
    * shingle — same contract as the signature kernels above.
    */
  def wordShingles(text: UTF8String, shingleSize: Int): ArrayData = {
    val words = tokenize(text.toString)
    if (words.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = math.max(1, shingleSize)
    val end = math.max(1, words.length - n + 1)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < end) {
      sb.setLength(0)
      var j = i
      val stop = math.min(words.length, i + n)
      while (j < stop) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS partial-overlap scheme): a polynomial ROLLING hash over
    * character k-grams of the whitespace-normalized lowercase text,
    * then the minimum hash of each window of w consecutive k-gram
    * hashes (rightmost min on ties), deduplicated in first-selection
    * order. Guarantee: any shared substring of length ≥ w + k - 1
    * produces at least one shared fingerprint. One pass, O(len)
    * amortized.
    */
  def winnowFingerprints(text: UTF8String, k0: Int, w0: Int): ArrayData = {
    val k = math.max(1, k0)
    val w = math.max(1, w0)
    // normalize like fingerprint(): lowercase, whitespace runs → ' '
    val words = tokenize(text.toString)
    if (words.isEmpty) return new GenericArrayData(Array.empty[Any])
    val s = words.mkString(" ")
    if (s.length < k) {
      return new GenericArrayData(Array[Any](mix64(fnv64(s))))
    }
    val m = s.length - k + 1
    // rolling polynomial hash, base 257, 2^64 wraparound (mixing math,
    // not ANSI arithmetic); mix64 avalanches each window hash
    val B = 257L
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = mix64(h)
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
      hashes(i) = mix64(h)
      i += 1
    }
    // winnow: rightmost minimum of each w-window, recorded when the
    // selected position changes
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= w) {
      var minIdx = 0
      i = 1
      while (i < m) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
      selected.add(hashes(minIdx))
    } else {
      var minIdx = -1
      var start = 0
      while (start <= m - w) {
        if (minIdx < start) {
          minIdx = start
          var j = start + 1
          while (j < start + w) {
            if (hashes(j) <= hashes(minIdx)) minIdx = j
            j += 1
          }
          selected.add(hashes(minIdx))
        } else {
          val incoming = start + w - 1
          if (hashes(incoming) <= hashes(minIdx)) {
            minIdx = incoming
            selected.add(hashes(minIdx))
          }
        }
        start += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over lowercase word shingles: each shingle votes
    * its hash bits up/down; the sign of each counter becomes the
    * output bit. Near-identical texts land within a small Hamming
    * distance.
    */
  def simhash64(text: UTF8String, shingleSize: Int): Long = {
    val words = tokenize(text.toString)
    if (words.isEmpty) return 0L
    val n = math.max(1, shingleSize)
    val counts = new Array[Int](64)
    val end = math.max(1, words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < end) {
      sb.setLength(0)
      var j = i
      val stop = math.min(words.length, i + n)
      while (j < stop) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      val h = fnv64(sb.toString)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(text, shingle_size)` → BIGINT (SURVEY D2). Hamming
  * distance between signatures uses the built-in
  * `bit_count(a ^ b)` — no custom expression needed there.
  */
case class SimHash64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    HashOps.simhash64(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = HashOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $ops.simhash64($t, $n);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `minhash_signature(text, num_hashes, shingle_size)` → ARRAY<BIGINT>
  * (SURVEY D2). One pass over the shingles; the LSH banding layer
  * folds this signature into bucket keys.
  */
case class MinHashSignature(
    first: Expression,
    second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_signature"
  override def inputTypes = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, k: Any, n: Any): Any =
    HashOps.minhashSignature(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = HashOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, k, n) => s"${ev.value} = $ops.minhashSignature($t, $k, $n);")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** `winnow_fingerprints(text, k, w)` → ARRAY<BIGINT> (SURVEY D4's
  * rolling-hash document fingerprint): winnowed k-gram rolling-hash
  * minima — shared substrings of length ≥ w + k - 1 are guaranteed to
  * collide, the partial-overlap primitive.
  */
case class WinnowFingerprints(
    first: Expression,
    second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "winnow_fingerprints"
  override def inputTypes = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, k: Any, w: Any): Any =
    HashOps.winnowFingerprints(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = HashOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, k, w) => s"${ev.value} = $ops.winnowFingerprints($t, $k, $w);")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** `word_shingles(text, n)` → ARRAY<STRING> (distinct lowercase word
  * n-grams; the Jaccard-verification companion of the signature
  * expressions).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "word_shingles"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    HashOps.wordShingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = HashOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $ops.wordShingles($t, $n);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `gram_hashes(text, n)` → ARRAY<BIGINT> (positional n-gram hashes
  * under raw space splitting; the repeated-span detection kernel —
  * SURVEY D18).
  */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "gram_hashes"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    HashOps.gramHashes(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = HashOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $ops.gramHashes($t, $n);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
