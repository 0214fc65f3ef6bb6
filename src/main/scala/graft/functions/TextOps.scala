package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path text primitives as native codegen expressions.
  *
  * The text/dedup catalog's inner loops were built from SQL
  * higher-order functions (`filter(split(text,'\\s+'), …)`,
  * `transform(sequence(…), i -> concat_ws(…))`,
  * `array_min(transform(hs, h -> substr(h, …)))`). Two measured costs
  * motivate replacing them (guide §4 — eliminate non-codegen
  * expressions in the hot path):
  *
  *  1. `split` re-compiles its regex per row (UTF8String.split calls
  *     Pattern.compile on every invocation), and every higher-order
  *     function is CodegenFallback — it breaks the whole-stage-codegen
  *     span and pays per-element lambda dispatch plus an intermediate
  *     array allocation per HOF node.
  *  2. The MinHash signature pipeline materialized, per document, one
  *     64-char hex string per shingle and then EIGHT further arrays of
  *     8-char substrings (one per signature slot) just to take eight
  *     mins.
  *
  * Each expression below is pinned BIT-IDENTICAL to the SQL
  * formulation it replaces by TextOpsSpec (property tests over
  * adversarial inputs, both formulations evaluated in the same
  * session); the DuckDB oracle SQL is untouched, so the driver's
  * hash-match gate re-proves equivalence end to end on every query
  * that rides these.
  */
object TextOps {

  /** Java-regex `\s` (default flags: ASCII-only): [ \t\n\x0B\f\r].
    * All six are single UTF-8 bytes < 0x80, so byte scanning is exact
    * on multibyte text (continuation bytes are >= 0x80). */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Exactly `filter(split(text, '\\s+'), t -> t != '')`: the maximal
    * runs of non-whitespace bytes, in order. Token slices share the
    * input's byte array (no per-token copy). */
  def wsTokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes // no copy when the UTF8String spans its array
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](8 + n / 6)
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  private val Space = UTF8String.fromString(" ")

  /** Exactly `transform(sequence(0, size(toks)-n), i -> concat_ws(' ',
    * toks[i], …, toks[i+n-1]))` for `size(toks) >= n` (the only regime
    * any call site evaluates it in — every caller guards on
    * `size(toks) >= n`, mirrored here as an empty-array return for
    * shorter inputs; the raw HOF's size<n behaviour — a DESCENDING
    * sequence indexing with negative ordinals — is deliberately not
    * reproduced). Null elements are skipped by concat_ws semantics. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(new Array[AnyRef](0))
    val m = sz - n + 1
    val out = new Array[AnyRef](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        // matches toks[i+j]: null stays null, concatWs skips it
        window(j) =
          if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val PrefA = Array[Byte]('a', '|')
  private val PrefB = Array[Byte]('b', '|')
  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  /** Exactly the K=8 MinHash signature pipeline
    * {{{
    * hs    = transform(shingles, sh -> concat(md5(concat('a|', sh)),
    *                                          md5(concat('b|', sh))))
    * sig_j = array_min(transform(hs, h -> substr(h, 8*j+1, 8)))
    * }}}
    * in one pass: per non-null shingle two md5 digests, each digest
    * sliced into four big-endian 32-bit words; eight running unsigned
    * mins (lexicographic min over fixed-width lowercase hex ==
    * unsigned numeric min); formatted to 8-char hex once at the end.
    * Null shingles contribute nothing (array_min skips nulls); an
    * input with no non-null shingle yields eight null slots (matching
    * array_min over an empty/all-null array). */
  def minhashSigs(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, 0xffffffffL + 1) // > any u32
    var any = false
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val sh = shingles.getUTF8String(i).getBytes
        md.reset(); md.update(PrefA); md.update(sh)
        val da = md.digest()
        md.reset(); md.update(PrefB); md.update(sh)
        val db = md.digest()
        var j = 0
        while (j < 4) {
          val va = ((da(4 * j) & 0xffL) << 24) | ((da(4 * j + 1) & 0xffL) << 16) |
            ((da(4 * j + 2) & 0xffL) << 8) | (da(4 * j + 3) & 0xffL)
          if (va < mins(j)) mins(j) = va
          val vb = ((db(4 * j) & 0xffL) << 24) | ((db(4 * j + 1) & 0xffL) << 16) |
            ((db(4 * j + 2) & 0xffL) << 8) | (db(4 * j + 3) & 0xffL)
          if (vb < mins(j + 4)) mins(j + 4) = vb
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](8)
    if (any) {
      var j = 0
      while (j < 8) {
        val hex = new Array[Byte](8)
        var k = 0
        while (k < 8) {
          hex(k) = HexChars(((mins(j) >>> (28 - 4 * k)) & 0xf).toInt)
          k += 1
        }
        out(j) = UTF8String.fromBytes(hex)
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** `ws_tokens(text)` — see [[TextOps.wsTokenize]]. */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    TextOps.wsTokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextOps.wsTokenize($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_ngrams(toks, n)` — see [[TextOps.wordNgrams]]. `n` must be a
  * positive integer literal (plan-time constant, like the HOF
  * formulation it replaces). */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams window must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextOps.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextOps.wordNgrams($in, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(shingles)` — see [[TextOps.minhashSigs]]. Returns the
  * 8-slot signature array (slots null iff no non-null shingle). */
case class MinhashSigs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    TextOps.minhashSigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextOps.minhashSigs($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
