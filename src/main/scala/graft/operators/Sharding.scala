package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment — Thaler &
  * Ravishankar 1998: route each key to argmax over shards of
  * h(key, shard). The property that matters at fleet scale: when a shard
  * is ADDED, the only keys that move are the ones the new shard now wins
  * (~1/(n+1) of them), and they ALL move to the new shard — no cascade,
  * no ring maintenance, no routing table. This is how a 100 TB corpus
  * keys to N sinks (embedding-store tenants, writer tasks, cache nodes)
  * without a re-shuffle storm on every topology change.
  *
  * Entirely narrow: the shard list is closure-embedded (config-sized) and
  * the argmax is a `greatest` over per-shard structs — one codegen'd
  * expression per row, no shuffle, no join. h = first 8 md5 hex digits of
  * `key@shard` as an unsigned 32-bit value (the engine's KM digest-prefix
  * convention), ties break to the greater shard name — both replayable in
  * ANSI SQL.
  */
object Sharding {

  private def weight(key: Column, shard: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit("@" + shard))), 1, 8),
      16, 10).cast("long")

  /** The winning shard for `key` under `shards`. */
  def rendezvousShard(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be non-empty and unique")
    val scored = shards.map(s =>
      struct(weight(key, s).as("h"), lit(s).as("shard")))
    val top =
      if (scored.size == 1) scored.head
      else greatest(scored: _*)
    top.getField("shard")
  }

  /** Assignment frame: (idCol, shard). */
  def assign(df: DataFrame, idCol: String, shards: Seq[String]): DataFrame =
    df.select(col(idCol),
      rendezvousShard(col(idCol), shards).as("shard"))
}
