package graft.dedup

/** DuckDB-SQL bit-replay of Spark's `xxhash64` (XXH64, seed 42) and of the
  * SimHash fingerprint built on it — the oracle for `x_dedup_simhash` and
  * `x_dedup_simhash_pairs`, which were rows-only checks while DuckDB
  * lacked xxhash64.
  *
  * The XXH64 rounds are generated as chained CTE stages over a HUGEINT
  * token-byte list — TRUE UTF-8 bytes synthesized from code points
  * ([[utf8Bytes]]), so the replay is exact on arbitrary text, not just
  * ASCII:
  *
  *  - all arithmetic is mod 2^64 in HUGEINT; 64x64-bit products would
  *    overflow the signed 128-bit HUGEINT, so multiplication is split
  *    into 32-bit halves (`mul`);
  *  - rotation = (x << r mod 2^64) + (x >> (64-r)) — disjoint bit ranges,
  *    so + is |;
  *  - the 32-byte stripe loop runs as four `list_reduce`s (one per
  *    accumulator lane), the 8-byte/1-byte tails as `list_reduce` with the
  *    running hash prepended (empty tail => seed passes through), and the
  *    length-dependent 4-byte step as a CASE — each XXH64 phase is one CTE
  *    stage so expression text stays linear, not exponential;
  *  - token semantics mirror [[SimHashExpr.simhash]] exactly:
  *    `trim(text).split(" ")` INCLUDING empty tokens from runs of spaces
  *    (and the single empty token of a blank document), first-win
  *    distinct, +/-1 per bit of each token hash, pack sign bits.
  *
  * Verified bit-identical to the Spark expression for every document at
  * sf0.01 and sf0.1.
  */
object SimHashOracle {

  private[graft] val M = "18446744073709551616::HUGEINT"
  private[graft] val P1 = "11400714785074694791::HUGEINT"
  private[graft] val P2 = "14029467366897019727::HUGEINT"
  private[graft] val P3 = "1609587929392839161::HUGEINT"
  private[graft] val P5 = "2870177450012600261::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  // XXH64 accumulator seeds for seed = 42 (mod 2^64)
  private val V1 = "6983438078262162944::HUGEINT"  // 42 + P1 + P2
  private val V2 = "14029467366897019769::HUGEINT" // 42 + P2
  private val V3 = "42::HUGEINT"
  private val V4 = "7046029288634856867::HUGEINT"  // 42 - P1
  private val SeedP5 = "2870177450012600303::HUGEINT" // 42 + P5

  /** (a * b) mod 2^64 via 32-bit limbs — a 64x64 product would overflow
    * the signed 128-bit HUGEINT.
    */
  private[graft] def mul(a: String, b: String): String =
    s"(((($a) % 4294967296) * (($b) % 4294967296) + " +
      s"((((($a) // 4294967296) * (($b) % 4294967296) + " +
      s"(($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M)"

  private def add(a: String, b: String): String = s"((($a) + ($b)) % $M)"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r}::HUGEINT) % $M + ($x) // ${java.math.BigInteger.ONE.shiftLeft(64 - r)}::HUGEINT)"

  /** XXH64 round: rotl64(acc + w * P2, 31) * P1. */
  private def round(acc: String, w: String): String =
    mul(rotl(add(acc, mul(w, P2)), 31), P1)

  /** Stripe merge round: (h ^ round(0, v)) * P1 + P4. */
  private def merge(h: String, v: String): String =
    add(mul(s"xor(($h), ${round("0::HUGEINT", v)})", P1), P4)

  private def lane(i: Int, init: String): String =
    s"list_reduce(list_prepend($init, " +
      s"list_transform(range(ns), s -> w8[4*s+$i])), (acc, x) -> ${round("acc", "x")})"

  // little-endian multi-byte reads over the 1-based byte list
  private val w8Sum: String =
    (0 until 8).map(k => s"bs[j*8+${k + 1}]*${1L << (8 * k)}::HUGEINT").mkString(" + ")
  private val r4Sum: String =
    (0 until 4).map(k => s"bs[len - (len % 8) + ${k + 1}]*${1L << (8 * k)}::HUGEINT").mkString(" + ")

  private val tail8Step: String =
    add(mul(rotl(s"xor(acc, ${round("0::HUGEINT", "x")})", 27), P1), P4)
  private val tail4Step: String =
    add(mul(rotl(s"xor(h8, ${mul(s"($r4Sum)", P1)})", 23), P2), P3)
  private val tailByteStep: String =
    mul(rotl(s"xor(acc, ${mul("x", P5)})", 11), P1)

  /** CTE chain from a caller-supplied `tk` body (any key columns plus a
    * `tok` string column) to `hashes(<keyProj>tok, h)` — h =
    * xxhash64(tok, 42) as an unsigned HUGEINT in [0, 2^64). Every
    * intermediate stage is `SELECT *`, so extra key columns flow through;
    * `keyProj` is the (comma-terminated, possibly empty) key projection
    * of the final stage. Reused by [[graft.sketch.CountMinOracle]].
    */
  /** UTF-8 byte list of a VARCHAR expression, synthesized from code
    * points with pure integer arithmetic (DuckDB indexes strings by code
    * point, so `unicode(x[i])` enumerates them; the CASE mirrors the
    * UTF-8 encoding rules bit-for-bit — validated against Python's
    * `encode()` on emoji/CJK/combining-mark corpora). This is what makes
    * every byte-level hash replay (XXH64 below, the rolling-hash oracle)
    * exact on ARBITRARY text, not just ASCII, matching Spark's
    * `UTF8String.getBytes` view of the same string.
    */
  private[graft] def utf8Bytes(col: String): String =
    s"""flatten(list_transform(range(1, length($col) + 1), i ->
       |  CASE WHEN unicode($col[i]) < 128 THEN [unicode($col[i])::HUGEINT]
       |       WHEN unicode($col[i]) < 2048 THEN
       |         [(192 + unicode($col[i]) // 64)::HUGEINT,
       |          (128 + unicode($col[i]) % 64)::HUGEINT]
       |       WHEN unicode($col[i]) < 65536 THEN
       |         [(224 + unicode($col[i]) // 4096)::HUGEINT,
       |          (128 + (unicode($col[i]) // 64) % 64)::HUGEINT,
       |          (128 + unicode($col[i]) % 64)::HUGEINT]
       |       ELSE
       |         [(240 + unicode($col[i]) // 262144)::HUGEINT,
       |          (128 + (unicode($col[i]) // 4096) % 64)::HUGEINT,
       |          (128 + (unicode($col[i]) // 64) % 64)::HUGEINT,
       |          (128 + unicode($col[i]) % 64)::HUGEINT]
       |  END))""".stripMargin

  private[graft] def hashChain(tkBody: String, keyProj: String): String =
    s"""tk AS ($tkBody),
       |tb AS (SELECT *, ${utf8Bytes("tok")} AS bs,
       |         length(bs) AS len FROM tk),
       |tw AS (SELECT *, len // 32 AS ns,
       |         list_transform(range(len // 8), j -> $w8Sum) AS w8 FROM tb),
       |tv AS (SELECT *, CASE WHEN len >= 32 THEN ${lane(1, V1)} END AS v1,
       |                 CASE WHEN len >= 32 THEN ${lane(2, V2)} END AS v2,
       |                 CASE WHEN len >= 32 THEN ${lane(3, V3)} END AS v3,
       |                 CASE WHEN len >= 32 THEN ${lane(4, V4)} END AS v4 FROM tw),
       |tm0 AS (SELECT *, CASE WHEN len >= 32 THEN (${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M END AS hm0 FROM tv),
       |tm1 AS (SELECT *, CASE WHEN len >= 32 THEN ${merge("hm0", "v1")} END AS hm1 FROM tm0),
       |tm2 AS (SELECT *, CASE WHEN len >= 32 THEN ${merge("hm1", "v2")} END AS hm2 FROM tm1),
       |tm3 AS (SELECT *, CASE WHEN len >= 32 THEN ${merge("hm2", "v3")} END AS hm3 FROM tm2),
       |tm4 AS (SELECT *, CASE WHEN len >= 32 THEN ${merge("hm3", "v4")} END AS hm4 FROM tm3),
       |th AS (SELECT *, ((CASE WHEN len >= 32 THEN hm4 ELSE $SeedP5 END) + len::HUGEINT) % $M AS h0 FROM tm4),
       |t8 AS (SELECT *, list_reduce(list_prepend(h0, list_slice(w8, 4*ns + 1, len // 8)), (acc, x) -> $tail8Step) AS h8 FROM th),
       |t4 AS (SELECT *, CASE WHEN len % 8 >= 4 THEN $tail4Step ELSE h8 END AS h4 FROM t8),
       |tby AS (SELECT *, list_reduce(list_prepend(h4, list_slice(bs, len - (len % 4) + 1, len)), (acc, x) -> $tailByteStep) AS hb FROM t4),
       |ta1 AS (SELECT *, ${mul("xor(hb, hb // 8589934592::HUGEINT)", P2)} AS ha1 FROM tby),
       |ta2 AS (SELECT *, ${mul("xor(ha1, ha1 // 536870912::HUGEINT)", P3)} AS ha2 FROM ta1),
       |hashes AS (SELECT ${keyProj}tok, xor(ha2, ha2 // 4294967296::HUGEINT) AS h FROM ta2)""".stripMargin

  /** [[hashChain]] over the distinct (doc_id, token) pairs of `documents`
    * — the simhash input relation: `hashes(doc_id, tok, h)`.
    */
  private val hashCtes: String = hashChain(
    """SELECT DISTINCT doc_id, tok FROM
      |        (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)""".stripMargin,
    "doc_id, ")

  /** SimHash packing on top of [[hashCtes]]: CTE `sh2(doc_id, simhash)`
    * with the fingerprint as a signed BIGINT (Spark's LongType view).
    * `private[graft]`: [[graft.multimodal.MultimodalOracle]] composes it
    * with the aHash CTEs for the mixed-media near-dup oracle.
    */
  private[graft] val simhashCtes: String =
    s"""pow(b, p) AS (
       |  SELECT 0, 1::HUGEINT UNION ALL SELECT b + 1, p * 2 FROM pow WHERE b < 63),
       |$hashCtes,
       |bits AS (SELECT doc_id, b, p, sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS s
       |         FROM hashes CROSS JOIN pow GROUP BY doc_id, b, p),
       |sh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN p ELSE 0::HUGEINT END)::HUGEINT AS hu
       |       FROM bits GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
       |                                 THEN hu - $M ELSE hu END AS BIGINT) AS simhash
       |        FROM sh)""".stripMargin

  /** Oracle for `x_dedup_simhash`: (doc_id, simhash). */
  val simhashSql: String =
    s"WITH RECURSIVE $simhashCtes\nSELECT doc_id, simhash FROM sh2"

  /** Oracle for `x_dedup_simhash_pairs`: the banding candidate generation
    * is an exact cover for hamming <= maxHamming (pigeonhole) followed by
    * an exact hamming filter, so the algorithm's output equals the plain
    * all-pairs hamming predicate — which is what the oracle states.
    */
  def pairsSql(maxHamming: Int): String =
    s"""WITH RECURSIVE $simhashCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin
}
