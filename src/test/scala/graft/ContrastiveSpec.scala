package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Contrastive

class ContrastiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triples: negatives never self-pair, positives are true adjacent chunks") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ") // 100 words -> 4 chunks of 32
    val docs = (0L until 6L).map(id => (id, s"doc$id $words")).toDF("doc_id", "text")
    val got = Contrastive.pairs(docs, "text", "doc_id", pageSize = 32)
      .select($"anchor_id", $"anchor_md5", $"pos_md5", $"neg_doc", $"neg_md5")
      .as[(String, String, String, Long, String)].collect()

    // 101 words -> ceil = 4 non-empty chunks -> 3 anchors per doc
    assert(got.length === 6 * 3)
    got.foreach { case (aid, aMd5, pMd5, negDoc, negMd5) =>
      val doc = aid.split("#")(0).toLong
      assert(negDoc != doc, s"self-negative for $aid")
      assert(negDoc >= 0 && negDoc < 6)
      assert(aMd5 != pMd5, "anchor and positive must be distinct chunks")
      assert(negMd5.nonEmpty)
    }
    // determinism: a second run yields the identical triple set
    val again = Contrastive.pairs(docs, "text", "doc_id", pageSize = 32)
      .select($"anchor_id", $"neg_doc").as[(String, Long)].collect().toSet
    assert(again === got.map(r => (r._1, r._4)).toSet)
  }

  test("short docs (one chunk) yield no anchors but still serve as negatives") {
    val long = (0L, ("x " * 70).trim) // 70 words -> 3 chunks, 2 anchors
    val short = (1L, "just a few words here")
    val got = Contrastive.pairs(Seq(long, short).toDF("doc_id", "text"),
        "text", "doc_id", pageSize = 32)
      .select($"anchor_id", $"neg_doc").as[(String, Long)].collect()
    assert(got.forall(_._1.startsWith("0#")), "the one-chunk doc cannot anchor")
    // with n = 2 the shift-by-hash negative is always the OTHER doc
    assert(got.forall(_._2 == 1L))
  }
}
