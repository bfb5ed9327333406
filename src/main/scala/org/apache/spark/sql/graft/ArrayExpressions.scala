// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: ExpectsInputTypes and the Expression->Column bridge
// (classic.ExpressionUtils) are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sliding-window minimum over `array<bigint>`: element j of the result is
  * `min(input[j .. j+w-1])`, for all `n - w + 1` windows. Shorter-than-one-
  * window inputs collapse to a single whole-array minimum (the window
  * clamps to `min(w, n)`); empty input yields an empty array.
  *
  * This is the winnowing kernel (Schleimer-Wilkerson-Aiken): the former
  * `transform(sequence(1, n-w+1), j -> array_min(slice(gh, j, w)))` form was
  * correct but interpreted — every byte of a corpus-wide scan paid the
  * lambda-interpreter constant x w (O(grams x w) with a large constant). This
  * expression is one monotonic-deque pass: O(grams) total, each index pushed
  * and popped at most once, inside whole-stage codegen. Bit-parity with the
  * HOF form is pinned in DedupSpec.
  *
  * Elements are read null-intolerantly (`getLong`), so the input array must
  * be typed `containsNull = false` — checkInputDataTypes rejects a nullable
  * element type at analysis time rather than returning silently wrong
  * minima. The winnowing pipeline feeds it xxhash64/CharGramHashes output,
  * both `containsNull = false`.
  */
case class SlidingMin(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else child.dataType match {
      case ArrayType(_, true) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName reads elements null-intolerantly and requires " +
          "array<bigint> with containsNull = false; pre-process the input " +
          "with array_compact (whose result type drops element nullability) " +
          "— a plain filter() keeps containsNull = true and still fails here")
      case _ => base
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val win = math.min(w, n)
    val out = new Array[Long](n - win + 1)
    val dq = new Array[Int](n) // deque of candidate indices, values ascending
    var head = 0
    var tail = 0 // occupied range is [head, tail)
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - win) head += 1
      if (i >= win - 1) out(i - win + 1) = a.getLong(dq(head))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val win = ctx.freshName("win")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |final long[] $out;
         |if ($n == 0) {
         |  $out = new long[0];
         |} else {
         |  final int $win = java.lang.Math.min($w, $n);
         |  $out = new long[$n - $win + 1];
         |  final int[] $dq = new int[$n];
         |  int $head = 0, $tail = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $v = $a.getLong($i);
         |    while ($tail > $head && $a.getLong($dq[$tail - 1]) >= $v) $tail--;
         |    $dq[$tail++] = $i;
         |    if ($dq[$head] <= $i - $win) $head++;
         |    if ($i >= $win - 1) $out[$i - $win + 1] = $a.getLong($dq[$head]);
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

/** xxhash64 of every character k-gram of a string: element i of the result
  * is `xxhash64(substr(s, i+1, k))` (seed 42, Spark's xxhash64 of the gram's
  * UTF-8 bytes), for all `numChars - k + 1` grams; strings shorter than k
  * characters yield an empty array.
  *
  * This is the other winnowing kernel: the former
  * `transform(sequence(1, len-k+1), i -> xxhash64(substr(norm, i, k)))` form
  * was the dominant q57 cost (measured 1.05 s of the 1.34 s sf0.1 table
  * scan) — an interpreted lambda plus a UTF8String allocation per character
  * position. Here: one byte walk builds the char-boundary offsets, then each
  * gram is hashed in place via `XXH64.hashUnsafeBytes` on its byte range —
  * zero per-gram allocation, whole-stage codegen, bit-identical for any
  * UTF-8 input (char offsets map to exact byte ranges, and Spark's
  * `xxhash64(string)` is XXH64 over the UTF-8 bytes with seed 42). Parity
  * with the HOF form is pinned in DedupSpec, and q57's containment contract
  * re-derives the gram sets through the HOF form, cross-checking the two
  * implementations corpus-subset-wide at every gate run.
  */
case class CharGramHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // one byte walk: offs(c) = byte offset of char c, offs(nChars) = numBytes
    val offs = new Array[Int](nb + 1)
    var nc = 0
    var b = 0
    while (b < nb) {
      offs(nc) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      nc += 1
    }
    offs(nc) = nb
    if (nc < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](nc - k + 1)
    var i = 0
    while (i <= nc - k) {
      out(i) = XXH64.hashUnsafeBytes(base, off + offs(i), offs(i + k) - offs(i), 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val nb = ctx.freshName("nb")
      val offs = ctx.freshName("offs")
      val nc = ctx.freshName("nc")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val uad = classOf[UnsafeArrayData].getName
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |final Object $base = $s.getBaseObject();
         |final long $off = $s.getBaseOffset();
         |final int $nb = $s.numBytes();
         |final int[] $offs = new int[$nb + 1];
         |int $nc = 0;
         |for (int $b = 0; $b < $nb; $nc++) {
         |  $offs[$nc] = $b;
         |  $b += $utf8.numBytesForFirstByte($s.getByte($b));
         |}
         |$offs[$nc] = $nb;
         |final long[] $out = $nc < $k ? new long[0] : new long[$nc - $k + 1];
         |for (int $i = 0; $i <= $nc - $k; $i++) {
         |  $out[$i] = $xxh.hashUnsafeBytes(
         |    $base, $off + $offs[$i], $offs[$i + $k] - $offs[$i], 42L);
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** Word n-gram shingles of a string, bit-identical to the HOF form
  * `zip_with`-folded over `split(trim(text), "\\s+")` shifted slices —
  * including that form's tokenizer quirks, which this kernel replicates
  * byte-for-byte:
  *
  *  - `trim` removes ASCII-32 spaces ONLY (UTF8String.trim), so other
  *    whitespace survives at the boundaries;
  *  - Java-regex `\s` is ASCII `[ \t\n\x0B\f\r]`, so non-ASCII whitespace
  *    never separates (UTF-8 continuation bytes have the high bit set and
  *    can't collide with the ASCII range);
  *  - `split` with limit -1 emits an empty FIRST token when the (space-
  *    trimmed) text starts with whitespace, an empty LAST token when it
  *    ends with whitespace, and `"".split` is `[""]` — one empty token;
  *  - fewer than `n` tokens yield an empty array (the HOF form's null-pad
  *    + filter); shingles join tokens with a single 0x20.
  *
  * The HOF chain is interpreted (HigherOrderFunction has no codegen) and
  * re-walks lambda trees per element; this kernel is one byte walk per row
  * plus one exact-size byte copy per shingle, inside whole-stage codegen.
  * Parity with the HOF form is pinned in TextFunctionsSpec across
  * whitespace-edge and multibyte fixtures, and the DuckDB oracle recomputes
  * shingles independently for q35/q36.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  // The kernel is one static-forwarder call rather than inlined janino —
  // one shared implementation keeps eval and codegen bit-identical by
  // construction, and the call stays inside the whole-stage-generated
  // method (same pattern as Spark's own regexp/string expressions).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[WordShingles].getName
      s"${ev.value} = $cls.compute($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Token byte ranges of the space-trimmed input, replicating Java
    * `split("\\s+", -1)` — see the class doc for the quirk inventory.
    * Returns (trimmed string, starts, lens, tokenCount). */
  private[graft] def tokenize(input: UTF8String): (UTF8String, Array[Int], Array[Int], Int) = {
    val s = input.trim() // ASCII-32 trim, same as SQL trim()
    val nb = s.numBytes()
    val starts = new Array[Int](nb / 2 + 2)
    val lens = new Array[Int](nb / 2 + 2)
    var m = 0
    if (nb == 0) { starts(0) = 0; lens(0) = 0; m = 1 }
    else {
      var i = 0
      if (isWs(s.getByte(0))) {
        starts(m) = 0; lens(m) = 0; m += 1 // leading separator -> empty token
        while (i < nb && isWs(s.getByte(i))) i += 1
        // all-whitespace: Java split(-1) sees one separator spanning the
        // string -> ["", ""]
        if (i == nb) { starts(m) = nb; lens(m) = 0; m += 1 }
      }
      while (i < nb) {
        val st = i
        while (i < nb && !isWs(s.getByte(i))) i += 1
        starts(m) = st; lens(m) = i - st; m += 1
        if (i < nb) {
          while (i < nb && isWs(s.getByte(i))) i += 1
          if (i == nb) { starts(m) = nb; lens(m) = 0; m += 1 } // trailing empty
        }
      }
    }
    (s, starts, lens, m)
  }

  /** Shared eval/codegen kernel; public static (via forwarder) for the
    * generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val (s, starts, lens, m) = tokenize(input)
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Any](m - n + 1)
    var j = 0
    while (j <= m - n) {
      var bytes = n - 1 // separators
      var t = j
      while (t < j + n) { bytes += lens(t); t += 1 }
      val buf = new Array[Byte](bytes)
      var pos = 0
      t = j
      while (t < j + n) {
        org.apache.spark.unsafe.Platform.copyMemory(
          base, off + starts(t), buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos, lens(t).toLong)
        pos += lens(t)
        if (t < j + n - 1) { buf(pos) = 0x20; pos += 1 }
        t += 1
      }
      out(j) = UTF8String.fromBytes(buf)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** xxhash64 (seed 42 — Spark's `xxhash64(string)`) of every word n-gram
  * shingle, WITHOUT materializing the shingle strings: element i equals
  * `xxhash64(word_shingles(text, n)[i])` bit-for-bit (pinned in
  * TextFunctionsSpec), but the kernel copies each shingle's bytes into one
  * reusable row-local buffer and hashes in place — no per-shingle
  * UTF8String, no array-of-strings, no second pass.
  *
  * This is the corpus-scan form the MinHash signature path wants: the
  * signature is a min over family hashes of these values, and a min over
  * the hash MULTISET equals the min over the distinct-shingle set (equal
  * shingles produce equal hashes), so the signature output is bit-identical
  * to hashing distinct materialized shingles while skipping both the
  * string materialization and the string-comparison distinct. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[WordShingleHashes].getName
      s"${ev.value} = $cls.compute($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  /** Shared eval/codegen kernel. */
  def compute(input: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(hashesOf(input, n))

  /** The raw hash array — shared with [[MinHashSignature]]. */
  private[graft] def hashesOf(input: UTF8String, n: Int): Array[Long] = {
    val (s, starts, lens, m) = WordShingles.tokenize(input)
    if (m < n) return Array.emptyLongArray
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // one row-local buffer sized to the largest shingle
    var maxBytes = 0
    var j = 0
    while (j <= m - n) {
      var bytes = n - 1
      var t = j
      while (t < j + n) { bytes += lens(t); t += 1 }
      if (bytes > maxBytes) maxBytes = bytes
      j += 1
    }
    val buf = new Array[Byte](maxBytes)
    val out = new Array[Long](m - n + 1)
    j = 0
    while (j <= m - n) {
      var pos = 0
      var t = j
      while (t < j + n) {
        org.apache.spark.unsafe.Platform.copyMemory(
          base, off + starts(t), buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos, lens(t).toLong)
        pos += lens(t)
        if (t < j + n - 1) { buf(pos) = 0x20; pos += 1 }
        t += 1
      }
      out(j) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      j += 1
    }
    out
  }
}

/** The complete per-row MinHash signature in one kernel: k family minima
  * over the document's shingle hashes, where family member `s` of hash `h`
  * is exactly Spark's `xxhash64(lit(s), h)` — i.e.
  * `XXH64.hashLong(h, XXH64.hashInt(s, 42))` — so the output is
  * bit-identical to the Column-built form (pinned in DedupSpec) and to
  * [[graft.operators.Dedup.minhashSignatureTable]]'s corpus form.
  * Shingle-less docs yield all-Long.MaxValue slots (the family sentinel).
  *
  * A min over the hash multiset equals the min over the distinct-shingle
  * set, so no distinct pass is needed. The former per-row form folded an
  * interpreted `aggregate` HOF k times per row (k full re-walks of the
  * hash array through the lambda interpreter); this kernel is one tokenize
  * + one O(shingles x k) primitive-loop pass, whole-stage-codegen'd — the
  * per-row signature is now as corpus-safe as the explode/groupBy table
  * form, which matters for streaming ingestion where per-row is the only
  * shape available. */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(k >= 1, s"family size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[MinHashSignature].getName
      s"${ev.value} = $cls.compute($s, $n, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Shared eval/codegen kernel. */
  def compute(input: UTF8String, n: Int, k: Int): ArrayData = {
    val hs = WordShingleHashes.hashesOf(input, n)
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val seedHash = XXH64.hashInt(s, 42L) // xxhash64(lit(s), _) prefix state
      var mn = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val f = XXH64.hashLong(hs(i), seedHash)
        if (f < mn) mn = f
        i += 1
      }
      out(s) = mn
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** 64-bit SimHash of a document in one kernel: xxhash64 (seed 42) of every
  * whitespace token (duplicates kept — SimHash is frequency-weighted), per-bit
  * +1/−1 majority vote, bit set iff the vote is strictly positive. Bit 63's
  * mask is Long.MinValue (same two's-complement identity the Column form
  * uses). Bit-identical to both prior forms (pinned in DedupSpec):
  * [[graft.operators.Dedup.simhash]]'s 64 interpreted aggregate() folds, and
  * the former explode/groupBy(64 sums) corpus table. Replacing the table form
  * with this makes corpus SimHash MAP-ONLY — no token explode, no 64-column
  * aggregate, no shuffle — which at 100 TB removes the only shuffle in the
  * fingerprint stage.
  *
  * NULL text is null here (UnaryExpression contract); the table form's
  * explode_outer path folded NULL docs to fingerprint 0, so
  * [[graft.operators.Dedup.simhashTable]] wraps this in coalesce(_, 0). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[SimHash64].getName
      s"${ev.value} = $cls.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared eval/codegen kernel. */
  def compute(input: UTF8String): Long = {
    val hs = WordShingleHashes.hashesOf(input, 1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

object ArrayExpressions {
  /** Column wrapper for [[SlidingMin]]. */
  def slidingMin(a: Column, w: Int): Column =
    ExpressionUtils.column(SlidingMin(ExpressionUtils.expression(a), w))

  /** Column wrapper for [[CharGramHashes]]. */
  def charGramHashes(s: Column, k: Int): Column =
    ExpressionUtils.column(CharGramHashes(ExpressionUtils.expression(s), k))

  /** Column wrapper for [[WordShingles]]. */
  def wordShingles(s: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(s), n))

  /** Column wrapper for [[WordShingleHashes]]. */
  def wordShingleHashes(s: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleHashes(ExpressionUtils.expression(s), n))

  /** Column wrapper for [[MinHashSignature]]. */
  def minhashSignature(s: Column, n: Int, k: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(s), n, k))

  /** Column wrapper for [[SimHash64]]. */
  def simhash64(s: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(s)))
}
