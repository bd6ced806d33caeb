package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the portable text-hash pipeline
  * (graft.operators.TextDedup). Each is semantically IDENTICAL to a
  * documented higher-order-function form that the DuckDB oracles
  * replay — same fold order, same modulus, same null edge cases — but
  * runs as a JVM loop instead of one interpreted lambda frame (plus a
  * UTF8String allocation) per character/element. Measured ~5× on the
  * sf0.1 dedup pipeline.
  *
  * CodegenFallback is deliberate: these feed explode/aggregate
  * boundaries, so whole-stage fusion around them buys little, and the
  * eval loop is already allocation-free.
  */
object TextHashes {
  /** Modulus shared with TextDedup.P and every oracle. */
  val P = 1000000007L

  /** Char-fold hash of one string, by code point — identical to
    * `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))), 0L, (a, c) -> (a*31 + c) % P)`. */
  def foldString(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** array<string> → array<bigint>: per-token char-fold hashes.
  * Null token → null element (as the lambda form yields). */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_token_hashes expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else TextHashes.foldString(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> → array<bigint>: FAST-mode token hashes — xxHash64
  * (seed 42, the same primitive behind Spark's `xxhash64`) of each
  * token's UTF-8 bytes, reduced into [0, P) so every downstream fold
  * (shingle, minhash permutation, simhash bit) runs unchanged. This
  * family is engine-private (not oracle-replayable) — it exists for
  * real 100 TB runs where cross-engine parity doesn't matter and hash
  * throughput does; the portable char-fold ([[TokenHashes]]) stays
  * the default. Same null semantics: null token → null element. */
case class TokenHashesFast(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_token_hashes_fast expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_hashes_fast"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else {
          val s = arr.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          ((h % TextHashes.P) + TextHashes.P) % TextHashes.P
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<bigint>, n) → array<bigint>: distinct word-n-gram shingle
  * hashes, fold (acc*131 + h) % P over each length-n window; arrays
  * shorter than n yield an empty array. First-occurrence distinct
  * order, null window-fold → single null entry — exactly the
  * `array_distinct(transform(sequence(...), i -> aggregate(slice(...))))` form. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects (array<bigint>, int), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(hashes: Any, nAny: Any): Any = {
    val arr = hashes.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i <= len - n) {
      var acc: java.lang.Long = 0L
      var j = 0
      while (j < n && acc != null) {
        if (arr.isNullAt(i + j)) acc = null
        else acc = (acc * 131 + arr.getLong(i + j)) % TextHashes.P
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** (array<bigint>, n) → array<bigint>: ORDERED, non-distinct word-
  * n-gram hashes — element i is the fold of window [i, i+n) — so
  * `posexplode` yields (position, gram) pairs for positional dedup
  * ([[graft.operators.SpanDedup]]). Same fold, modulus, and null
  * propagation as [[ShingleHashes]]; the only difference is keeping
  * order and repeats, exactly the
  * `transform(sequence(1, size-n+1), i -> aggregate(slice(th, i, n), ...))`
  * form the oracles replay. Arrays shorter than n yield empty. */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes expects (array<bigint>, int), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(hashes: Any, nAny: Any): Any = {
    val arr = hashes.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var acc: java.lang.Long = 0L
      var j = 0
      while (j < n && acc != null) {
        if (arr.isNullAt(i + j)) acc = null
        else acc = (acc * 131 + arr.getLong(i + j)) % TextHashes.P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<bigint> → bigint: 32-bit SimHash. Bit j set iff the sum over
  * hashes of (bit j of h ? +1 : −1) is positive; any null element
  * zeroes every bit (the lambda fold's null propagation through
  * `if(null > 0, ...)`). Multiset semantics — repeats weigh in. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >>> j) & 1L) * 2 - 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<bigint>, numHashes) → array<bigint>: MinHash signature —
  * sig[i] = min over hashes of ((2i+1)·h + 999983·i) mod P; empty
  * input → all-null elements, null elements skipped by the min
  * (array_min semantics) — identical to the
  * `transform(sequence(...), i -> array_min(transform(...)))` form. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<bigint>, int), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(hashes: Any, nAny: Any): Any = {
    val arr = hashes.asInstanceOf[ArrayData]
    val numHashes = nAny.asInstanceOf[Int]
    val len = arr.numElements()
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      var found = false
      var j = 0
      while (j < len) {
        if (!arr.isNullAt(j)) {
          val v = ((2L * i + 1) * arr.getLong(j) + 999983L * i) % TextHashes.P
          if (v < min) min = v
          found = true
        }
        j += 1
      }
      out(i) = if (found) min else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** (array<bigint>, n, w) → array<bigint>: winnowing fingerprints (the
  * MOSS scheme) — ordered n-gram hashes, minimum of each length-`w`
  * sliding window over them, first-occurrence distinct. Bit-identical
  * to the documented HOF form
  * `array_distinct(if(size < n, array(), transform(sequence(1, greatest(size-(n+w-2),1)), i -> array_min(transform(sequence(i, least(i+w-1, size-(n-1))), j -> aggregate(slice(th,j,n), 0L, (a,h) -> (a*131+h)%P))))))`
  * that the oracles replay — same gram fold/modulus/null propagation
  * as [[GramHashes]], array_min's skip-nulls (null fp only when every
  * gram in the window is null), single global window when there are
  * fewer than `w` grams. The HOF form is O(tokens·w·n) interpreted
  * lambda frames per document (CollapseProject re-inlines it per
  * reference); this loop is O(tokens) via a monotonic deque. */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects (array<bigint>, int, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(hashes: Any, nAny: Any, wAny: Any): Any = {
    val arr = hashes.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val w = wAny.asInstanceOf[Int]
    require(n > 0 && w > 0, s"graft_winnow needs n > 0 and w > 0, got n=$n w=$w")
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val g = len - n + 1
    val grams = new Array[java.lang.Long](g)
    var i = 0
    while (i <= len - n) {
      var acc: java.lang.Long = 0L
      var j = 0
      while (j < n && acc != null) {
        if (arr.isNullAt(i + j)) acc = null
        else acc = (acc * 131 + arr.getLong(i + j)) % TextHashes.P
        j += 1
      }
      grams(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Any]()
    if (g < w) {
      // fewer grams than one full window → one global min
      var min: java.lang.Long = null
      var k = 0
      while (k < g) {
        val v = grams(k)
        if (v != null && (min == null || v < min)) min = v
        k += 1
      }
      seen.add(min)
    } else {
      // monotonic deque of gram indices with ascending values; null
      // grams never enter, so an empty deque after eviction means the
      // window was all-null (array_min → null)
      val dq = new java.util.ArrayDeque[Int]()
      var e = 0
      while (e < g) {
        val v = grams(e)
        if (v != null) {
          while (!dq.isEmpty && grams(dq.peekLast()) >= v) dq.pollLast()
          dq.addLast(e)
        }
        if (e >= w - 1) {
          val start = e - w + 1
          while (!dq.isEmpty && dq.peekFirst() < start) dq.pollFirst()
          seen.add(if (dq.isEmpty) null else grams(dq.peekFirst()))
        }
        e += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TextHashExprs {
  val tokenInfo = new ExpressionInfo(classOf[TokenHashes].getCanonicalName, null,
    "graft_token_hashes", "graft_token_hashes(arr) - portable char-fold hash per token", "")
  val shingleInfo = new ExpressionInfo(classOf[ShingleHashes].getCanonicalName, null,
    "graft_shingle_hashes", "graft_shingle_hashes(hashes, n) - distinct n-gram shingle hashes", "")
  val simhashInfo = new ExpressionInfo(classOf[SimHash32].getCanonicalName, null,
    "graft_simhash", "graft_simhash(hashes) - 32-bit SimHash fingerprint", "")
  val minhashInfo = new ExpressionInfo(classOf[MinHashSig].getCanonicalName, null,
    "graft_minhash", "graft_minhash(hashes, n) - n-permutation MinHash signature", "")
  val tokenFastInfo = new ExpressionInfo(classOf[TokenHashesFast].getCanonicalName, null,
    "graft_token_hashes_fast", "graft_token_hashes_fast(arr) - xxHash64-mod-P hash per token", "")
  val gramInfo = new ExpressionInfo(classOf[GramHashes].getCanonicalName, null,
    "graft_gram_hashes", "graft_gram_hashes(hashes, n) - ordered positional n-gram hashes", "")
  val winnowInfo = new ExpressionInfo(classOf[WinnowFingerprints].getCanonicalName, null,
    "graft_winnow", "graft_winnow(hashes, n, w) - distinct winnowing fingerprints (MOSS)", "")

  val tokenBuilder: Seq[Expression] => Expression =
    { case Seq(a) => TokenHashes(a); case a => argErr("graft_token_hashes", 1, a.length) }
  val shingleBuilder: Seq[Expression] => Expression =
    { case Seq(a, b) => ShingleHashes(a, b); case a => argErr("graft_shingle_hashes", 2, a.length) }
  val simhashBuilder: Seq[Expression] => Expression =
    { case Seq(a) => SimHash32(a); case a => argErr("graft_simhash", 1, a.length) }
  val minhashBuilder: Seq[Expression] => Expression =
    { case Seq(a, b) => MinHashSig(a, b); case a => argErr("graft_minhash", 2, a.length) }
  val tokenFastBuilder: Seq[Expression] => Expression =
    { case Seq(a) => TokenHashesFast(a); case a => argErr("graft_token_hashes_fast", 1, a.length) }
  val gramBuilder: Seq[Expression] => Expression =
    { case Seq(a, b) => GramHashes(a, b); case a => argErr("graft_gram_hashes", 2, a.length) }
  val winnowBuilder: Seq[Expression] => Expression =
    { case Seq(a, b, c) => WinnowFingerprints(a, b, c)
      case a => argErr("graft_winnow", 3, a.length) }

  private def argErr(name: String, want: Int, got: Int): Nothing =
    throw new IllegalArgumentException(s"$name expects $want arguments, got $got")
}
