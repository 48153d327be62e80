package graft.text

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution Shannon entropy of a text column in
  * [[Vocabulary.FracBits]]-bit fixed point — the gibberish / low-diversity
  * quality signal (random keyboard mash ≈ uniform ≈ high entropy; one
  * repeated character or padding run ≈ 0; English text ≈ 4.0–4.5 bits).
  *
  * Operationally defined as exact integers so a DuckDB oracle replays it
  * bit-for-bit:
  *
  * {{{ ent_fp = log2fp(n) − (Σ_c k_c · log2fp(k_c)) div n }}}
  *
  * with per-character counts `k_c`, `n = Σ k_c`, and `log2fp` =
  * [[Vocabulary.log2Fixed]](x, 1) (30-bit mantissa, 20 fraction bits) —
  * algebraically `H = log2 n − (1/n)·Σ k log2 k`, floored twice.
  *
  * A pure per-row function, so it runs as ONE codegen'd scalar inside the
  * scan — no character explode, no shuffle, corpus-size-independent (the
  * relational explode+groupBy form exists only inside the oracle SQL).
  * Characters are Unicode CODE POINTS on both sides (the loop below
  * steps by `Character.charCount`, matching DuckDB's
  * `string_split(text, '')`), so surrogate-pair (astral) text counts
  * identically — no ASCII/BMP precondition. Requires `n < 2^33` per
  * document ([[Vocabulary.log2Fixed]]'s magnitude bound).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropyFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.CharEntropyExpr.entropyFp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyExpr {

  def entropyCol(text: Column): Column =
    GraftColumnBridge.column(CharEntropyExpr(GraftColumnBridge.expression(text)))

  /** Static entry point shared by interpreted eval and generated code.
    * ASCII counts ride a flat 128-slot array (the hot path); anything
    * else falls back to a map. Long addition is commutative-exact, so
    * accumulation order can't change the result.
    */
  def entropyFp(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var acc = 0L
    var j = 0
    while (j < 128) {
      val k = ascii(j)
      if (k > 0L) acc += k * Vocabulary.log2Fixed(k, 1L)
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val k = it.next(); acc += k * Vocabulary.log2Fixed(k, 1L) }
    }
    Vocabulary.log2Fixed(n, 1L) - acc / n
  }
}
