package graft.core

/** Tier-taken observability for every budget-dispatched operator (the
  * iterative graph family in [[graft.operators.Graph]], union-find in
  * [[graft.operators.Dedup]], and the portable gated walks in
  * [[graft.operators.GraphAnn]]).
  *
  * Each dispatch records which tier actually served a call — `driver`
  * (under-budget local iteration) or `distributed` (the join-per-round
  * loop, the only shape at real corpus volumes). Without this, a
  * regression that silently kills the size Observation fails SAFE to the
  * distributed loop but reads exactly like host noise in the bench
  * (round-11 verdict: the +34-38% ppr/directed/hits cluster was
  * indistinguishable from a dead observation). The bench harness
  * snapshots these counters per query and ships them in the full
  * per-query metrics JSON; TierDispatchSpec pins that the gated fixtures
  * actually take the driver tier and that a zero budget forces the
  * distributed one.
  *
  * Counters are process-wide and monotone; callers diff snapshots. With
  * `SPARK_GRAFT_DEBUG` set, each record also prints a `[tier]` line.
  */
object TierStats {

  private val counts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private val debug = sys.env.contains("SPARK_GRAFT_DEBUG")

  /** Record that `op` served a call on `tier` ("driver"|"distributed"). */
  def record(op: String, tier: String): Unit = {
    counts.computeIfAbsent(s"$op:$tier",
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    if (debug) System.err.println(s"[tier] $op -> $tier")
  }

  /** Immutable snapshot of all counters ("op:tier" -> count). */
  def snapshot(): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counts.forEach((k, v) => b += (k -> v.get()))
    b.result()
  }

  /** Per-query delta between two snapshots, empty entries dropped. */
  def diff(before: Map[String, Long], after: Map[String, Long]): Map[String, Long] =
    after.flatMap { case (k, v) =>
      val d = v - before.getOrElse(k, 0L)
      if (d > 0) Some(k -> d) else None
    }

  /** Test hook: forget everything (counters are otherwise monotone). */
  def reset(): Unit = counts.clear()
}
