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
    // every gram size is emitted from ONE tokenize pass (tagged structs,
    // concatenated per row) — three separate derivations would re-scan and
    // re-tokenize the corpus once per size, the dominant cost at scale; the
    // (doc, tag, gram) shuffle carries the same bytes either way.
    def grams(n: Int, tag: String): String =
      s"""IF(size(t) >= $n,
         |  transform(sequence(1, size(t) - ${n - 1}),
         |    i -> named_struct('tag', '$tag', 'gram', array_join(slice(t, i, $n), ' '))),
         |  array())""".stripMargin
    val tagged = Dedup.spread(df)
      .select(col(idCol).as("doc_id"),
        TextFunctions.wsTokens(lower(col(textCol))).as("t"))
      .select(col("doc_id"), explode(expr(
        s"concat(${grams(2, "b")}, ${grams(3, "t")}, ${grams(8, "o")})")).as("g"))
    // per-(doc, tag): share of the top gram + coverage of repeated grams,
    // then fold the tags to columns with conditional aggregation (one more
    // doc-keyed agg, no self-joins).
    val byTag = tagged
      .groupBy(col("doc_id"), col("g").as("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("g.tag").as("tag"))
      .agg(round(max(col("cnt")) / sum(col("cnt")), 4).as("top_frac"),
        round(sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)) / sum(col("cnt")), 4)
          .as("dup_frac"))
    val folded = byTag.groupBy(col("doc_id")).agg(
      max(when(col("tag") === "b", col("top_frac"))).as("top_bigram_frac"),
      max(when(col("tag") === "t", col("top_frac"))).as("top_trigram_frac"),
      max(when(col("tag") === "o", col("dup_frac"))).as("dup_8gram_frac"))
    df.select(col(idCol).as("doc_id"))
      .join(folded, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("top_bigram_frac", "top_trigram_frac", "dup_8gram_frac"))
  }
}
