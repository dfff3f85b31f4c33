package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repetition-based quality signals — the "excessive repetition" filters a
  * large-scale training-data pipeline applies alongside the length/punct
  * heuristics in [[graft.functions.TextFunctions.qualityScore]] (the
  * Gopher-rules family: fraction of content owned by the most frequent
  * n-gram, fraction covered by repeated long n-grams).
  *
  * Scale shape: every aggregation is keyed by (doc, gram) then (doc) — all
  * map-side-combinable, per-group state bounded by the DOCUMENT's own gram
  * count, never corpus-wide. No windows, no joins except the final
  * doc-keyed assembly of the three signal frames (one shuffle each at
  * document cardinality, not token cardinality).
  */
object Repetition {

  /** Per-document repetition signals:
    *   - `top_bigram_frac` / `top_trigram_frac`: share of all n-grams taken
    *     by the single most frequent one (high = loops/boilerplate);
    *   - `dup_8gram_frac`: fraction of 8-gram occurrences that belong to an
    *     8-gram seen more than once in the doc (near-verbatim self-copy).
    * Documents too short for an n-gram score 0 for it (total extension).
    */
  def signals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.spread(df).select(col(idCol).as("doc_id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("t"))

    // (doc, gram) counts for word n-grams of size n; grams assembled per row
    // (narrow), exploded, then hash-aggregated with map-side partials.
    def gramCounts(n: Int): DataFrame = toks
      .where(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))"))
        .as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))

    def topFrac(n: Int, out: String): DataFrame = gramCounts(n)
      .groupBy(col("doc_id"))
      .agg(round(max(col("cnt")) / sum(col("cnt")), 4).as(out))

    val dupFrac = gramCounts(8)
      .groupBy(col("doc_id"))
      .agg(round(sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)) / sum(col("cnt")), 4)
        .as("dup_8gram_frac"))

    df.select(col(idCol).as("doc_id"))
      .join(topFrac(2, "top_bigram_frac"), Seq("doc_id"), "left")
      .join(topFrac(3, "top_trigram_frac"), Seq("doc_id"), "left")
      .join(dupFrac, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("top_bigram_frac", "top_trigram_frac", "dup_8gram_frac"))
  }
}
