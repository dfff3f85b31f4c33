package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.UnicodeExpressions.{nfcNormalize, stripAccents}
import graft.plans.UnicodeNorm
import org.apache.spark.unsafe.types.UTF8String

class UnicodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val composed = "caf\u00e9"      // NFC: precomposed e-acute
  private val decomposed = "cafe\u0301"   // NFD: e + combining acute

  test("stripAccents folds Latin accents, keeps base letters and non-Mn marks") {
    def f(s: String) = UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString
    assert(f("na\u00efve r\u00e9sum\u00e9 \u00e0") === "naive resume a")
    assert(f(composed) === "cafe" && f(decomposed) === "cafe")
    // German eszett and Polish stroked-l are NOT accents (no Mn in NFD): kept
    assert(f("stra\u00dfe \u0142") === "stra\u00dfe \u0142")
  }

  test("nfc recomposes decomposed sequences; ASCII short-circuits to the same object") {
    def nfc(s: String) = UnicodeNorm.nfc(UTF8String.fromString(s)).toString
    assert(decomposed !== composed)                 // the probe is real
    assert(nfc(decomposed) === composed)
    assert(nfc(composed) === composed)
    val ascii = UTF8String.fromString("plain ascii")
    assert(UnicodeNorm.nfc(ascii) eq ascii)
    assert(UnicodeNorm.stripAccents(ascii) eq ascii)
  }

  test("expressions run inside a DataFrame (codegen path) and are null-safe") {
    val df = Seq(
      (1L, composed), (2L, decomposed), (3L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val out = df.select(col("id"),
        stripAccents(col("s")).as("st"), nfcNormalize(col("s")).as("nf"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "cafe" && out(0).getString(2) === composed)
    assert(out(1).getString(1) === "cafe" && out(1).getString(2) === composed)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    // NFC canonicalization makes the two byte-spellings exact-dedup-able
    val n = df.where(col("s").isNotNull)
      .select(nfcNormalize(col("s")).as("k")).distinct().count()
    assert(n === 1L)
  }
}
