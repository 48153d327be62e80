package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextFunctions

/** The 4 count-min bucket indices of a token as ONE scalar expression:
  * `bucket_r = (xxhash64(tok, 42) * A_r) >>> (64 - widthBits)` — one
  * xxhash64 (Spark's own, via [[XxHash64Function]], so the DuckDB bit
  * replay in [[graft.dedup.SimHashOracle]] covers it) followed by a
  * multiply-shift universal-hash family whose odd multipliers are the
  * XXH64 primes themselves. Plain `h * A` would trip ANSI overflow
  * checking as a Column expression; inside the codegen'd expression it is
  * Java's wrap-around semantics — exactly the mod-2^64 product the oracle
  * states. No shuffle, no state: scan speed.
  */
case class CmsBucketsExpr(child: Expression, widthBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_buckets"

  override def nullSafeEval(input: Any): Any =
    CmsBucketsExpr.buckets(input.asInstanceOf[UTF8String], widthBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sketch.CmsBucketsExpr.buckets($c, $widthBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsBucketsExpr {

  /** The four odd XXH64 primes as the multiply-shift family (top
    * `widthBits` bits of `h * A_r` — Dietzfelbinger et al.'s universal
    * hashing; odd multiplier is the only requirement).
    */
  // NB: r10 part 7 fixed a transcription typo in the P1 literal
  // (-7046029254386353131 ≠ P1 mod 2^64): the old value was still an odd
  // multiplier, so the sketch was statistically sound and self-consistent
  // — but it silently diverged from the oracle's true-P1 bucket mapping,
  // which the min-estimate top-k gate could never see (both sides
  // collision-free at the top => identical estimates). The raw-counter
  // streaming gate (x_stream_cms_exec) is what surfaced it.
  val Multipliers: Array[Long] = Array(
    -7046029288634856825L, // P1 = 11400714785074694791
    -4417276706812531889L, // P2 = 14029467366897019727
    1609587929392839161L,  // P3
    2870177450012600261L)  // P5

  val Depth: Int = Multipliers.length

  /** Static entry point shared by interpreted eval and generated code. */
  def buckets(s: UTF8String, widthBits: Int): ArrayData = {
    val h = XxHash64Function.hash(s, StringType, 42L)
    val shift = 64 - widthBits
    val out = new Array[Long](Multipliers.length)
    var r = 0
    while (r < Multipliers.length) {
      out(r) = (h * Multipliers(r)) >>> shift
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  def bucketsCol(c: Column, widthBits: Int): Column =
    GraftColumnBridge.column(CmsBucketsExpr(
      GraftColumnBridge.expression(c.cast("string")), widthBits))
}

/** Count-min sketch over the corpus token stream: fixed-size frequency
  * summaries where the exact `groupBy(token)` vocabulary shuffle is
  * infeasible.
  *
  * Scale shape (the whole point of the sketch): [[sketch]]'s only wide op
  * is `groupBy(r, bucket)` over `Depth * 2^widthBits` DISTINCT keys — the
  * map-side partial aggregation collapses every task's token stream into
  * at most that many rows, so the shuffle carries
  * `partitions * Depth * 2^widthBits` rows regardless of corpus size (a
  * 100 TB corpus shuffles the same few MB a 100 GB one does). The
  * finished sketch is KBs and broadcasts; [[estimates]] then answers
  * point queries against it with no further wide op on the sketch side.
  * Estimates are BIASED UP (collisions only add), never down:
  * `est >= exact` always, with overestimate bounded by
  * `corpus_tokens * e / 2^widthBits` at depth-many sigmas
  * (Cormode & Muthukrishnan 2005).
  *
  * Everything is integer counts + the bit-replayable hash family, so the
  * DuckDB oracle ([[CountMinOracle]]) reconstructs the sketch exactly —
  * unlike engine-opaque sketches (HLL/KLL), nothing here is
  * approximately compared.
  */
object CountMin {

  /** Corpus token stream: the house tokenizer minus empty tokens (runs of
    * spaces carry no frequency signal, unlike in SimHash where they keep
    * document alignment).
    */
  def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")

  /** Build the sketch: `(r, bucket, cnt)` with `Depth * 2^widthBits`
    * rows. Single pass, bounded combiner state — see object scaladoc.
    */
  def sketch(toks: DataFrame, widthBits: Int): DataFrame =
    toks.select(posexplode(
        CmsBucketsExpr.bucketsCol(col("token"), widthBits)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query estimates for `candidates(token)`: min over the token's
    * `Depth` bucket counters (a bucket the sketch never saw counts 0 —
    * only possible for tokens outside the sketched corpus). The sketch
    * broadcasts; candidates stream.
    */
  def estimates(candidates: DataFrame, sketchDf: DataFrame,
      widthBits: Int): DataFrame =
    candidates.select(col("token"), posexplode(
        CmsBucketsExpr.bucketsCol(col("token"), widthBits)).as(Seq("r", "bucket")))
      .join(broadcast(sketchDf), Seq("r", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Demonstration query: sketch-estimated top-`k` tokens beside their
    * exact counts (`est >= exact` row by row; equality wherever the
    * token's buckets are collision-free). The exact side exists to GRADE
    * the sketch — production heavy-hitter flows keep only the sketch and
    * a candidate stream.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
      widthBits: Int): DataFrame = {
    val toks = tokens(docs, textCol)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact"))
    estimates(exact.select(col("token")), sketch(toks, widthBits), widthBits)
      .join(exact, Seq("token"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
  }
}
