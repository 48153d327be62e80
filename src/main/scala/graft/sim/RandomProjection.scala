package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed random projection (Achlioptas 2003's database-friendly
  * Johnson–Lindenstrauss transform): compress a d-dim embedding to
  * `outDim` dims with a fixed ±1 matrix — `y_j = Σ_i s_ij · x_i` — so a
  * 64-dim float32 vector becomes e.g. 16 integer accumulators (4× the
  * storage cut before any further quantization). Unlike the sign-LSH
  * bucket (one BIT per plane, [[Similarity.lshBucket]]), the projection
  * keeps MAGNITUDES: dot products are preserved in expectation
  * (`E[⟨y_a,y_b⟩] = outDim · ⟨x_a,x_b⟩` for ±1 entries), so the
  * compressed vectors still rank by similarity — the ingest-time
  * pre-filter representation for coarse candidate generation, with the
  * float vectors only touched at re-rank.
  *
  * Determinism: inputs are quantized first (`q_i = floor(x_i·2^20 + 0.5)`
  * — the established fixed-point projection of the gated embedding ops),
  * and the sign matrix is a SHARED CONSTANT derived from md5 driver-side
  * ([[signMatrix]]) and embedded as literals in both the Spark plan and
  * the SQL twin — no cross-engine hash-function dependency at all. Every
  * output is an exact int64 (|y_j| ≤ d·2^21 ≪ 2^63).
  *
  * Scale shape: pure scan arithmetic — the unrolled sum is one codegen'd
  * projection per row, no shuffle, no join; at 1000 executors it rides
  * the ingest scan like the fingerprint/entropy expressions.
  */
object RandomProjection {

  /** Deterministic ±1 entries: parity of the first hex nibble of
    * `md5("rp_<j>_<i>")`. Computed once driver-side; both engines see
    * the same literals.
    */
  def signMatrix(inDim: Int, outDim: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val h = md.digest(s"rp_${j}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 0) 1 else -1
    }
  }

  /** Project `vecCol` (array<float|double>, length `inDim`) to `outDim`
    * fixed-point accumulators. Output: (idCol, proj_fp array<bigint>).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      "need 1 <= outDim <= inDim")
    val s = signMatrix(inDim, outDim)
    val q: Int => Column = i => expr(
      s"CAST(floor(CAST($vecCol[$i] AS DOUBLE) * 1048576.0D + 0.5D) AS BIGINT)")
    val outs = (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        if (s(j)(i) > 0) q(i) else -q(i)
      }.reduce(_ + _)
    }
    df.select(col(idCol), array(outs: _*).as("proj_fp"))
  }

  /** DuckDB twin of [[project]] over `embeddings`: the identical
    * quantization and the identical literal sign matrix, unrolled.
    * (DuckDB lists are 1-based.)
    */
  def projectSql(inDim: Int, outDim: Int): String = {
    val s = signMatrix(inDim, outDim)
    def q(i: Int) =
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)"
    val outs = (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        (if (s(j)(i) > 0) " + " else " - ") + q(i)
      }.mkString("(0", "", ")")
    }
    s"""SELECT vec_id, [${outs.mkString(", ")}] AS proj_fp
       |FROM embeddings""".stripMargin
  }
}
