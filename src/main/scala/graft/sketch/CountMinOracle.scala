package graft.sketch

import graft.dedup.SimHashOracle

/** DuckDB-SQL replay of [[CountMin]]: the xxhash64 bit-replay chain
  * ([[SimHashOracle.hashChain]]) feeds the same multiply-shift bucket
  * family (mod-2^64 products via the 32-bit-limb `mul`, `>>>` as HUGEINT
  * integer division), the sketch is rebuilt as sum-of-exact-counts per
  * (r, bucket) — numerically identical to Spark's raw-stream
  * `groupBy(r, bucket).count` — and the top-k estimate query mirrors
  * [[CountMin.heavyHitters]] including the left-join-0 convention and
  * the (est desc, token) tie-break.
  */
object CountMinOracle {

  /** Unsigned-decimal forms of [[CmsBucketsExpr.Multipliers]]. */
  private val MultipliersSql: Seq[String] = Seq(
    SimHashOracle.P1, SimHashOracle.P2, SimHashOracle.P3, SimHashOracle.P5)

  /** Oracle for `x_stream_cms_exec`: the raw sketch counters
    * `(r, bucket, cnt)` rebuilt batch-side over a filtered corpus —
    * streaming == batch because every counter is an associative sum.
    */
  def sketchSql(widthBits: Int, where: String): String = {
    val div = java.math.BigInteger.ONE.shiftLeft(64 - widthBits)
    val values = MultipliersSql.zipWithIndex
      .map { case (a, r) => s"($r, $a)" }.mkString(", ")
    val whereSql = if (where.isEmpty) "" else s" WHERE $where"
    s"""WITH
       |t AS (SELECT tok AS token FROM
       |        (SELECT unnest(string_split(trim(text), ' ')) AS tok
       |         FROM documents$whereSql)
       |      WHERE tok <> ''),
       |exact AS (SELECT token, count(*)::BIGINT AS exact FROM t GROUP BY token),
       |${SimHashOracle.hashChain("SELECT DISTINCT token AS tok FROM t", "")},
       |b AS (SELECT tok, r,
       |        ${SimHashOracle.mul("h", "a")} // $div::HUGEINT AS bucket
       |      FROM hashes CROSS JOIN (VALUES $values) m(r, a))
       |SELECT r, CAST(bucket AS BIGINT) AS bucket, sum(exact)::BIGINT AS cnt
       |FROM b JOIN exact ON b.tok = exact.token GROUP BY r, bucket""".stripMargin
  }

  /** Oracle for `x_sketch_cms_topk`: (token, est, exact). */
  def heavyHittersSql(k: Int, widthBits: Int): String = {
    val div = java.math.BigInteger.ONE.shiftLeft(64 - widthBits)
    val values = MultipliersSql.zipWithIndex
      .map { case (a, r) => s"($r, $a)" }.mkString(", ")
    s"""WITH
       |t AS (SELECT tok AS token FROM
       |        (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents)
       |      WHERE tok <> ''),
       |exact AS (SELECT token, count(*)::BIGINT AS exact FROM t GROUP BY token),
       |${SimHashOracle.hashChain("SELECT DISTINCT token AS tok FROM t", "")},
       |b AS (SELECT tok, r,
       |        ${SimHashOracle.mul("h", "a")} // $div::HUGEINT AS bucket
       |      FROM hashes CROSS JOIN (VALUES $values) m(r, a)),
       |sk AS (SELECT r, bucket, sum(exact)::BIGINT AS cnt
       |       FROM b JOIN exact ON b.tok = exact.token GROUP BY r, bucket),
       |est AS (SELECT tok, min(coalesce(cnt, 0))::BIGINT AS est
       |        FROM b LEFT JOIN sk USING (r, bucket) GROUP BY tok)
       |SELECT e.tok AS token, e.est, x.exact
       |FROM est e JOIN exact x ON e.tok = x.token
       |ORDER BY e.est DESC, token LIMIT $k""".stripMargin
  }
}
