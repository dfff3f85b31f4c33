package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Contrastive training-pair mining — the (anchor, positive, negative)
  * triples an embedding model (the engine's own query/document encoder
  * family) trains on. The standard unsupervised recipe over a document
  * corpus: positives are ADJACENT chunks of the same document (local
  * coherence), negatives are pseudo-random chunks of OTHER documents.
  *
  * Everything is deterministic and seedless-replayable:
  *  - chunking reuses [[Chunker.pageChunks]] (the reference's splitter);
  *  - positive pairs come straight off each document's chunk ARRAY
  *    (`transform(sequence)` over adjacent indices — zero joins, zero
  *    shuffles for the positive half);
  *  - the negative document for anchor (doc, g) is
  *    `neg = (doc + 1 + (md5_32(doc || '#' || g) mod (n-1))) mod n` over the
  *    0..n-1 contiguous id space — the classic "shift by 1..n-1" trick, so
  *    `neg != doc` BY CONSTRUCTION (no rejection loop, no branch an oracle
  *    could drift on);
  *  - the negative join fetches each negative doc's representative
  *    (first) chunk through one equi-join against a docs-sized
  *    representative table (broadcastable at any corpus size where ids
  *    fit a dimension table; corpus-sized only in the anchor stream).
  */
object Contrastive {

  /** (anchor_id, anchor_md5, pos_md5, neg_doc, neg_md5) triples.
    * `df` must carry a contiguous 0..n-1 numeric id in `idCol` (the fixture
    * contract; production re-keys with zipWithIndex-style dense ids). */
  def pairs(df: DataFrame, textCol: String, idCol: String,
            pageSize: Int = 32): DataFrame = {
    val docs = Dedup.spread(df).select(col(idCol).cast("long").as("doc_id"),
      Chunker.pageChunks(col(textCol), pageSize).as("chunks"))
    // drop the possible empty tail page (the reference's //n+1 quirk) so
    // positives never pair a real chunk with an empty one
    val trimmed = docs.withColumn("chunks",
      filter(col("chunks"), c => length(trim(c)) > 0))
    val nDocs = trimmed.agg(count(lit(1)).as("n_docs"))

    // positive pairs straight off the chunk array: (g, g+1) adjacency
    val anchors = trimmed
      .where(size(col("chunks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("chunks")) - 2),
          g => struct(g.as("g"),
            element_at(col("chunks"), g + 1).as("anchor_text"),
            element_at(col("chunks"), g + 2).as("pos_text")))).as("p"))
      .select(col("doc_id"), col("p.g").as("g"),
        col("p.anchor_text"), col("p.pos_text"))

    // deterministic negative doc id: shift-by-h over the other n-1 docs.
    // A 1-doc corpus has no possible negative: the guard nulls neg_doc
    // (pmod by n-1 = 0 would be an ANSI divide error) and the inner
    // representative join then yields the correct empty triple set.
    val h32 = conv(substring(md5(concat_ws("#",
      col("doc_id"), col("g"))), 1, 8), 16, 10).cast("long")
    val withNeg = anchors.crossJoin(broadcast(nDocs))
      .withColumn("neg_doc", when(col("n_docs") > 1L,
        pmod(col("doc_id") + 1L + pmod(h32, col("n_docs") - 1L), col("n_docs"))))

    // representative (first non-empty) chunk per doc for the negative side
    val reps = trimmed.where(size(col("chunks")) >= 1)
      .select(col("doc_id").as("neg_doc"),
        element_at(col("chunks"), 1).as("neg_text"))

    withNeg.join(reps, Seq("neg_doc"))
      .select(
        concat_ws("#", col("doc_id"), col("g")).as("anchor_id"),
        md5(col("anchor_text")).as("anchor_md5"),
        md5(col("pos_text")).as("pos_md5"),
        col("neg_doc"),
        md5(col("neg_text")).as("neg_md5"))
  }
}
