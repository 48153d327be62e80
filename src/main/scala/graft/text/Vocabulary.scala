package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-training prep: corpus-wide token frequencies → a
  * deterministic top-N vocabulary → documents encoded as id sequences.
  * (Reference scope: the reference has no tokenizer surface — this is
  * north-star training-pipeline territory, like the dedup/ANN families.)
  *
  * Scale shape: the frequency pass is the canonical map-side-combined
  * `groupBy(token).count` — the shuffle carries at most
  * (partitions × distinct tokens) rows, not the token stream. The top-N
  * cut is an ordered limit (TakeOrdered); the id-assignment window runs
  * AFTER the cut, over ≤ `size` rows — a deliberate tiny global window,
  * never one over the corpus. Encoding broadcasts the vocab (a top-N
  * vocab is KBs–MBs) so the token stream never shuffles to look ids up;
  * the only wide op is the per-doc reassembly groupBy.
  */
object Vocabulary {

  /** Top-`size` tokens by (freq desc, token asc) — the tie-break makes
    * vocab ids reproducible across runs and engines — with 0-based ids
    * assigned in rank order.
    */
  def buildVocab(df: DataFrame, textCol: String, size: Int,
      minCount: Long = 1L): DataFrame = {
    val top = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .orderBy(col("freq").desc, col("token"))
      .limit(size)
    // window input is the ≤ size-row top cut, not the corpus
    top.withColumn("token_id",
      (row_number().over(Window.orderBy(col("freq").desc, col("token"))) - 1)
        .cast("long"))
  }

  /** DuckDB twin of [[buildVocab]] over the `documents` table. */
  def buildVocabSql(size: Int, minCount: Long = 1L): String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents),
       |c AS (
       |  SELECT token, count(*) AS freq FROM tok GROUP BY token
       |  HAVING count(*) >= $minCount)
       |SELECT token, freq,
       |  CAST(row_number() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT) AS token_id
       |FROM c ORDER BY freq DESC, token LIMIT $size""".stripMargin

  /** Encode each document as its token-id sequence under `vocab`
    * (out-of-vocabulary → `oovId`). The vocab side broadcasts; token
    * order is preserved via posexplode + array_sort on (pos, id).
    */
  def encode(df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      oovId: Long = -1L): DataFrame =
    df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(oovId)).as("tid"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("tid")))).as("_pt"))
      .select(col(idCol), expr("transform(_pt, x -> x.tid)").as("token_ids"))

  /** DuckDB twin of [[encode]] over `documents` with the [[buildVocabSql]]
    * vocab inlined. Parallel `unnest`s zip, giving (token, pos) rows.
    */
  def encodeSql(size: Int, minCount: Long = 1L, oovId: Long = -1L): String =
    s"""WITH tokl AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(toks) AS token,
       |    unnest(range(1, len(toks) + 1)) AS pos
       |  FROM tokl),
       |tcnt AS (
       |  SELECT token, count(*) AS freq FROM tok GROUP BY token
       |  HAVING count(*) >= $minCount),
       |v AS (
       |  SELECT token,
       |    CAST(row_number() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT) AS token_id
       |  FROM tcnt ORDER BY freq DESC, token LIMIT $size)
       |SELECT t.doc_id,
       |  list(coalesce(v.token_id, CAST($oovId AS BIGINT)) ORDER BY t.pos) AS token_ids
       |FROM tok t LEFT JOIN v ON t.token = v.token
       |GROUP BY t.doc_id""".stripMargin
}
