package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.BinaryQuant

/** Perceptual-hash (dHash) near-duplicate detection for media payloads —
  * the image-dedup rung of the multimodal pipeline (re-encoded / lightly
  * edited copies of the same image survive exact-byte dedup; a difference
  * hash over a fixed resample grid catches them).
  *
  * dHash (the classic 8x8 difference hash): resample the payload onto a
  * fixed 65-cell grid by nearest-neighbor (the same resample contract as
  * [[Multimodal.resizeStub]] — a real pixel pipeline swaps in a decoded
  * luminance row here), emit bit i = grid(i+1) > grid(i), pack the 64 bits
  * into two 32-bit words ([[BinaryQuant]]'s layout, so Hamming reuses the
  * same XOR+popcount path).
  *
  * Scale shape: hashing is one compiled pass per row (zero shuffles, 8
  * bytes of state per media item). Candidate generation NEVER goes
  * all-pairs: the 64-bit hash splits into 4 x 16-bit bands and pairs meet
  * through a band equi-join — by pigeonhole, any pair within Hamming
  * maxH <= bands-1 shares at least one exact band, so the banded join is
  * LOSSLESS for the thresholds dHash dedup uses (<= 3), while a band key
  * space of 2^16 x 4 keeps bucket skew bounded.
  */
object PerceptualHash {

  /** 64-bit dHash of a byte payload as (h0, h1) 32-bit words (bit i of the
    * hash = word i/32, position i%32 — [[BinaryQuant.packWord]]'s layout).
    * Null/empty payloads hash to (0, 0). */
  def dHash64(payload: Array[Byte]): (Long, Long) = {
    if (payload == null || payload.isEmpty) return (0L, 0L)
    val grid = new Array[Int](65)
    var i = 0
    while (i < 65) {
      grid(i) = payload((i.toLong * payload.length / 65).toInt) & 0xff
      i += 1
    }
    var h0 = 0L; var h1 = 0L
    i = 0
    while (i < 64) {
      if (grid(i + 1) > grid(i)) {
        if (i < 32) h0 |= 1L << i else h1 |= 1L << (i - 32)
      }
      i += 1
    }
    (h0, h1)
  }

  private val dHashUdf = udf { (payload: Array[Byte]) => dHash64(payload) }

  /** Media frame -> (media cols..., h0, h1). One compiled pass, narrow. */
  def withDHash(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media.withColumn("__h", dHashUdf(col(payloadCol)))
      .withColumn("h0", col("__h._1")).withColumn("h1", col("__h._2"))
      .drop("__h")

  /** The 4 x 16-bit band keys of an (h0, h1) hash pair. */
  private def bandKeys(h0: Column, h1: Column): Column = array(
    h0.bitwiseAND(0xffffL),
    shiftright(h0, 16).bitwiseAND(0xffffL),
    h1.bitwiseAND(0xffffL),
    shiftright(h1, 16).bitwiseAND(0xffffL))

  /** Near-dup media pairs within Hamming `maxHamming` of each other.
    * Requires maxHamming <= 3: the 4-band pigeonhole join is lossless
    * exactly when a qualifying pair cannot differ in every band. */
  def nearDupPairs(media: DataFrame, maxHamming: Int = 3,
                   idCol: String = "media_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded join is lossless only for maxHamming <= 3, got $maxHamming")
    val hashed = graft.operators.Dedup.spread(
        withDHash(media, payloadCol))
      .select(col(idCol).cast("long").as("id"), col("h0"), col("h1"))
    val banded = hashed.select(col("id"), col("h0"), col("h1"),
      posexplode(bandKeys(col("h0"), col("h1"))))
      .select(col("id"), col("h0"), col("h1"),
        col("pos").as("band_idx"), col("col").as("band_key"))
    val a = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id1"), col("h0").as("a0"), col("h1").as("a1"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id2"), col("h0").as("b0"), col("h1").as("b1"))
    a.join(b, Seq("band_idx", "band_key"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        BinaryQuant.hamming(col("a0"), col("a1"), col("b0"), col("b1"))
          .as("hamming"))
      .distinct() // a pair may share several bands
      .where(col("hamming") <= maxHamming)
  }
}
