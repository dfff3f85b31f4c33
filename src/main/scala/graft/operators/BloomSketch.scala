package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership sketch — the streaming/broadcast-scale
  * "have we seen this document before" primitive (dedup against a reference
  * corpus without shipping the reference). The filter state is fixed-width
  * by construction (m bits regardless of corpus size) and MERGEABLE (union
  * of set positions = filter of the union), so shards build partial filters
  * map-side and a union-distinct merges them — the same discipline as the
  * CMS/HLL sketches.
  *
  * Hashing is the md5-seed house convention (`md5(key # j)` → first 8 hex
  * chars → int → mod m) rather than murmur, so the exact bit pattern is
  * ANSI-replayable by the DuckDB oracle — the portable twin discipline;
  * a throughput-first deployment would swap xxhash64 in behind the same
  * shape. Guarantee: NO false negatives (every inserted key probes true);
  * false positives at the standard (1-e^(-kn/m))^k rate.
  */
object BloomSketch {

  /** The k bit positions of a key: position_j = int(md5(key + "#" + j)[0:8])
    * mod m, computed row-locally as an array. */
  def keyPositions(key: Column, k: Int, m: Int): Column = {
    require(k >= 1 && m >= 2)
    transform(sequence(lit(0), lit(k - 1)), j =>
      pmod(conv(substring(md5(concat(key, lit("#"), j.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(m.toLong)))
  }

  /** Build the filter over a reference key column: ONE row holding the
    * sorted distinct set positions (<= m elements — the fixed-width state;
    * sorted so the sketch itself is hashable/comparable). Map-side
    * distinct on (at most) m values, then a single collect_set. */
  def build(ref: DataFrame, key: Column, k: Int, m: Int): DataFrame =
    ref.select(explode(keyPositions(key, k, m)).as("pos")).distinct()
      .agg(array_sort(collect_set(col("pos"))).as("bits"))

  /** Probe a key column against a built filter: adds `bloom_hit` (all k
    * positions set). The one-row filter enters via broadcast cross join;
    * the membership check is a row-local `forall` over the k positions —
    * zero shuffle on the probe side. */
  def probe(probes: DataFrame, key: Column, bits: DataFrame,
            k: Int, m: Int): DataFrame =
    probes.crossJoin(broadcast(bits))
      .withColumn("bloom_hit",
        forall(keyPositions(key, k, m), p => array_contains(col("bits"), p)))
      .drop("bits")
}
