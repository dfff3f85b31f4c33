package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level TF-IDF term scoring — the classic distributed text-feature
  * operator for a training-data pipeline (document keyword profiles, quality
  * filtering, topic skims). The reference's keyword extraction
  * (`/root/reference/app/app.py:49-56`) is per-row only; TF-IDF is its
  * corpus-statistics counterpart (every weight depends on the whole corpus).
  */
object TfIdf {

  /** Top-k highest-TF-IDF terms per document.
    *
    * tf = raw term count within the doc; idf = ln((N + 1) / (df + 1)) + 1
    * (the smoothed form — strictly positive, no div-by-zero, and every
    * component is plain arithmetic an ANSI oracle replicates exactly).
    *
    * Shuffle profile at scale: tokenize/explode is narrow; tf is one
    * hash-shuffle on (doc, term) with map-side partial counts; df is one
    * shuffle on term over the already-collapsed (doc, term) frame (never the
    * raw token stream); N joins in as a broadcast 1-row frame. The per-doc
    * top-k is a groupBy(doc) collect_list + array_sort + slice — per-group
    * state is bounded by the doc's own distinct terms (doc-sized, not
    * corpus-sized) and aggregates map-side, where a row_number window would
    * re-shuffle and sort the full (doc, term) table to discard all but k. */
  def topTerms(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame = {
    val toks = Dedup.spread(df).select(col(idCol).as("doc_id"),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        (log((col("n_docs").cast("double") + 1.0) / (col("df_t") + 1.0)) + 1.0), 4))
    scored.groupBy(col("doc_id"))
      // sort key (-score, term): score desc then term asc — deterministic
      // under ties and identical to the oracle's ORDER BY.
      .agg(slice(array_sort(collect_list(struct((-col("score")).as("neg"),
        col("term").as("term")))), 1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.term").as("term"), (-col("col.neg")).as("score"))
  }
}
