package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget document chunking — the packing step of a training-data
  * pipeline: long documents become consecutive, non-overlapping pieces of
  * at most `maxTokens` whitespace tokens each, keyed by (doc, chunk_idx)
  * so downstream shuffling/packing can reassemble order.
  *
  * Shape: one `split` per row materialized ONCE in a projection, then a
  * `posexplode` over a `transform(sequence(...))` of chunk slices — a
  * narrow per-row expansion with no shuffle and no UDF; at 100 TB it runs
  * at scan speed and the output inherits the input partitioning. The
  * whole computation is integer arithmetic over a deterministic
  * tokenization, so the DuckDB oracle replays it exactly
  * ([[Chunking.chunkSql]] states the same formula).
  */
object Chunking {

  /** Split `textCol` into consecutive chunks of at most `maxTokens`
    * whitespace tokens. Output: (idCol, chunk_idx, chunk_text, n_tokens) —
    * chunk_idx is 0-based and dense per document; every token of the
    * input appears in exactly one chunk, in order.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val nChunks = ceil(size(col("_graft_toks")) / lit(maxTokens.toDouble)).cast("int")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_graft_toks"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        i => array_join(slice(col("_graft_toks"), i * maxTokens + 1, lit(maxTokens)), " "))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("n_tokens", TextFunctions.tokenCount(col("chunk_text")).cast("long"))
  }

  /** DuckDB twin of [[chunkByTokens]] — same tokenization, same 1-based
    * slice arithmetic, same recount of `n_tokens` from the joined chunk
    * text. Keep formula-identical to the Column version.
    */
  def chunkSql(table: String, idCol: String, textCol: String,
      maxTokens: Int): String = {
    val n = maxTokens
    s"""WITH _toks AS (
       |  SELECT $idCol, string_split(trim($textCol), ' ') AS t FROM $table),
       |_ex AS (
       |  SELECT $idCol, t,
       |    unnest(range(CAST(ceil(len(t) / $n.0) AS BIGINT))) AS i
       |  FROM _toks),
       |_chunks AS (
       |  SELECT $idCol, CAST(i AS INTEGER) AS chunk_idx,
       |    array_to_string(list_slice(t, CAST(i*$n+1 AS BIGINT), CAST(i*$n+$n AS BIGINT)), ' ') AS chunk_text
       |  FROM _ex)
       |SELECT $idCol, chunk_idx, chunk_text,
       |  CAST(len(string_split(trim(chunk_text), ' ')) AS BIGINT) AS n_tokens
       |FROM _chunks""".stripMargin
  }
}
