package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UDTF: stream the canonical within-`window` skip-gram pairs of a text
  * column — one `(w1, w2)` row (lexicographic order, so symmetric pairs
  * collapse) per (position, offset) — feeding
  * [[Vocabulary.skipgramCounts]]'s count aggregation.
  *
  * Why a `Generator` and not array higher-order functions: the HOF form
  * (`flatten(transform(toks, (x, i) -> transform(slice(...), ...)))`)
  * materializes a per-row array of structs and copies it through
  * `flatten` before exploding — measured at 1M 40-word docs it is
  * allocation-bound, not shuffle-bound ([[graft.dedup.SimHashExpr]]'s
  * lesson at the Generator level). Here pairs stream out of `eval` with
  * one token split per document and zero intermediate collections; the
  * UTF8String token slices are emitted as-is (no String round-trip).
  * Tokenization matches [[TextFunctions.tokens]] (single-space split of
  * the trimmed text), so output is row-identical to the HOF formulation
  * and the range-join oracle.
  */
case class SkipgramGenerator(child: Expression, window: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(window >= 1, "window must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("w1", StringType).add("w2", StringType)
  override def prettyName: String = "graft_skipgrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val toks = raw.asInstanceOf[UTF8String].trim.split(
      UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < 2) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      private var d = 1
      override def hasNext: Boolean = i + d < n
      override def next(): InternalRow = {
        val a = toks(i)
        val b = toks(i + d)
        d += 1
        if (d > window || i + d >= n) { i += 1; d = 1 }
        if (a.compareTo(b) <= 0) InternalRow(a, b) else InternalRow(b, a)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SkipgramGenerator {
  import org.apache.spark.sql.Column

  def skipgrams(c: Column, window: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(SkipgramGenerator(
      org.apache.spark.sql.GraftColumnBridge.expression(c), window))
}
