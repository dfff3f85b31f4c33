package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SymSpell-style spell correction (Garbe's symmetric-delete algorithm):
  * candidate generation is a HASH JOIN on distance-1 delete keys — both the
  * dictionary term and the query expand to {self} ∪ {all single-character
  * deletes}, and any query/term pair within edit distance 1 is guaranteed
  * to share a key (the symmetric-delete property) — then the exact
  * `levenshtein` verifies and ranks. No all-pairs edit distance, no
  * per-query vocabulary scan: the delete index is Σ|term| rows
  * (vocabulary-sized, built once, shardable), and each query contributes
  * |query|+1 key lookups. The same architecture serves at any dictionary
  * size — the candidate pool per key is bounded by how many terms share a
  * delete, not by the vocabulary.
  */
object SpellCorrect {

  /** {term} ∪ its distance-1 deletes, deduped — the symmetric-delete key
    * set, computed row-locally. */
  def deleteKeys(term: Column): Column =
    array_union(array(term),
      transform(sequence(lit(1), length(term)), i =>
        concat(term.substr(lit(1), i - 1),
          term.substr(i + 1, length(term) - i))))

  /** Correct each query term against a (term, freq) dictionary: candidates
    * via the delete-key join, verified to edit distance <= 1, ranked by
    * (distance asc, freq desc, term asc), top `n` kept. The rank window
    * partitions by query term over its (key-bounded) candidate set.
    * Output: (query_term, suggestion, distance, freq, rank). */
  def correct(vocab: DataFrame, termCol: String, freqCol: String,
              queries: DataFrame, queryCol: String, n: Int = 3): DataFrame = {
    require(n >= 1)
    // two-step selects: aliasing and key expansion in ONE select would make
    // the expansion resolve against the fresh alias (a lateral column
    // reference Spark rejects inside Generate)
    val idx = vocab.select(col(termCol).as("__t"), col(freqCol).as("__f"))
      .select(col("__t"), col("__f"),
        explode(deleteKeys(col("__t"))).as("__key"))
    val qx = queries.select(col(queryCol).as("query_term"))
      .select(col("query_term"),
        explode(deleteKeys(col("query_term"))).as("__key"))
    val cand = qx.join(idx, "__key")
      .select(col("query_term"), col("__t"), col("__f")).distinct()
      .withColumn("distance", levenshtein(col("query_term"), col("__t")))
      .where(col("distance") <= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_term"))
      .orderBy(col("distance"), col("__f").desc, col("__t"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select(col("query_term"), col("__t").as("suggestion"),
        col("distance"), col("__f").as("freq"), col("rank"))
  }
}
