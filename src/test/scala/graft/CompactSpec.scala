package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexTable

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  /** Generation dirs under the base zone that hold tenant `alias`. */
  private def genDirsFor(path: String, alias: String): Seq[java.io.File] = {
    val root = new java.io.File(s"$path/_graft_base")
    if (!root.isDirectory) Seq.empty
    else root.listFiles().toSeq.filter(g =>
      g.isDirectory && g.getName.startsWith("gen_") &&
        new java.io.File(g, s"index_alias=$alias").isDirectory)
  }

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet")
    .select(concat_ws("/", $"source", $"doc_id").as("document_path"), $"text")

  test("compact drops stale upsert generations and shrinks the file count") {
    val path = java.nio.file.Files.createTempDirectory("compact_plain").toString + "/idx"
    // two full generations of the same documents -> every id has a stale copy
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    val before = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    val rawBefore = IndexTable.read(spark, path, "t").count()
    val filesBefore = parquetFiles(s"$path/index_alias=t")

    val survivors = IndexTable.compact(spark, path, "t")

    val after = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    assert(after === before, "latest-per-id content must be unchanged")
    assert(survivors === before.size.toLong)
    assert(survivors < rawBefore, "stale generations must be physically dropped")
    assert(IndexTable.read(spark, path, "t").count() === survivors,
      "physical view after compaction must hold exactly the survivors")
    val gens = genDirsFor(path, "t")
    assert(gens.size === 1)
    assert(parquetFiles(gens.head.toString) < filesBefore)

    // folded delta files are retained for in-flight readers (default
    // retention window), then vacuumed once the window has passed
    assert(new java.io.File(s"$path/index_alias=t").exists(),
      "folded delta files are retained inside the retention window")
    IndexTable.vacuum(spark, path, "t", retainMillis = 0)
    assert(!new java.io.File(s"$path/index_alias=t").exists(),
      "superseded delta partition must be retired after the retention window")
    assert(IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet === before)
  }

  test("a delta appended after compact wins over the generation row") {
    val path = java.nio.file.Files.createTempDirectory("compact_overlay").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.compact(spark, path, "t")
    val base = IndexTable.readLatest(spark, path, "t")
    val ids = base.select($"id").as[String].collect().toSet
    // re-ingest one document with mutated text: same row keys, new content
    val updated = docs.limit(1).withColumn("text", concat(lit("UPDATED "), $"text"))
    IndexTable.append(IndexTable.ingestRecords(updated, "t", pageSize = 32), path)
    val after = IndexTable.readLatest(spark, path, "t")
    assert(after.select($"id").as[String].collect().toSet === ids,
      "an upsert must not change the id set")
    assert(after.where($"page_content".startsWith("UPDATED")).count() >= 1,
      "the delta row must shadow its generation row")
    assert(after.count() === base.count())
  }

  test("compact preserves the bucketed layout and its pruned reads") {
    val path = java.nio.file.Files.createTempDirectory("compact_bucketed").toString + "/idx"
    val bits = 2
    val dim = graft.core.ModelRegistry.dim(graft.core.ModelRegistry.default)
    val records = IndexTable.ingestRecords(docs, "t", pageSize = 32)
    IndexTable.appendBucketed(records, path, bits, dim)
    IndexTable.appendBucketed(IndexTable.ingestRecords(docs, "t", pageSize = 32),
      path, bits, dim)

    val qvec = graft.functions.Embedder.embedQuery("fast spark table scan")
    val probes = graft.plans.LshTopKPruneRule
      .probeBuckets(qvec, bits, dim, IndexTable.DefaultLshSeed)
    val before = IndexTable.readLatestPruned(spark, path, "t", probes.toSeq)
      .select($"id").as[String].collect().toSet

    IndexTable.compact(spark, path, "t")

    val gens = genDirsFor(path, "t")
    assert(gens.size === 1)
    val bucketDirs = new java.io.File(gens.head, "index_alias=t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__lsh_bucket=")).map(_.getName)
    assert(bucketDirs.length > 1, s"bucket layout lost: ${bucketDirs.toSeq}")
    val after = IndexTable.readLatestPruned(spark, path, "t", probes.toSeq)
      .select($"id").as[String].collect().toSet
    assert(after === before, "pruned reads must be unchanged by compaction")
  }

  test("a concurrent reader never observes a missing or doubled tenant during compaction") {
    val path = java.nio.file.Files.createTempDirectory("compact_race").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    val expected = IndexTable.readLatest(spark, path, "t").count()
    assert(expected > 0)

    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get())
        observed.add(
          try IndexTable.readLatest(spark, path, "t").count()
          catch { case _: Throwable => -1L }) // a failed read is a violation too
    })
    reader.start()
    try {
      // several cycles so reads land inside the publish/retire sequence
      (1 to 3).foreach(_ => IndexTable.compact(spark, path, "t"))
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    val counts = observed.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(counts.nonEmpty, "reader thread never completed a read")
    assert(counts.forall(_ === expected),
      s"reader saw inconsistent counts: ${counts.distinct} (expected $expected)")
  }

  test("a crashed compaction is invisible to readers and cleaned by the next run") {
    val path = java.nio.file.Files.createTempDirectory("compact_crash").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    val before = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet

    // Simulate a compaction that died mid-write: a generation dir with
    // tenant data but NO _SUCCESS marker (readers must ignore it).
    val partial = new java.io.File(s"$path/_graft_base/gen_999999999999999/index_alias=t")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(partial, "part-corrupt.parquet").toPath,
      Array[Byte](1, 2, 3))

    val mid = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    assert(mid === before, "partial generation must be invisible to readers")

    val survivors = IndexTable.compact(spark, path, "t", retainMillis = 0)
    assert(survivors === before.size.toLong)
    assert(!partial.getParentFile.exists(),
      "crashed-compaction debris must be removed by the next compaction")
    val after = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    assert(after === before)
  }

  test("repeated compaction with an expired retention window keeps exactly one generation") {
    val path = java.nio.file.Files.createTempDirectory("compact_gens").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    (1 to 3).foreach { _ =>
      IndexTable.append(IndexTable.ingestRecords(
        docs.limit(5), "t", pageSize = 32), path)
      IndexTable.compact(spark, path, "t", retainMillis = 0)
    }
    val gens = genDirsFor(path, "t")
    assert(gens.size === 1, s"generations must not accumulate: ${gens.map(_.getName)}")
    // and the newest generation alone carries the full resolved content
    val expected = IndexTable.readLatest(spark, path, "t").count()
    assert(IndexTable.read(spark, path, "t").count() === expected)
  }

  test("committed generations are time-travel snapshots until vacuumed") {
    val path = java.nio.file.Files.createTempDirectory("compact_travel").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.compact(spark, path, "t") // gen A = folded v1 state
    val Seq(genA) = IndexTable.generations(spark, path, "t")
    val stateA = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet

    // overwrite every document (same paths -> same ids, new content), fold
    val docs2 = docs.withColumn("text", concat($"text", lit(" updatedv2")))
    IndexTable.append(IndexTable.ingestRecords(docs2, "t", pageSize = 32), path)
    IndexTable.compact(spark, path, "t") // gen B
    val gensNow = IndexTable.generations(spark, path, "t")
    assert(gensNow.size === 2 && gensNow.last === genA && gensNow.head > genA,
      "catalog must list both committed generations, newest first")

    // as-of A: exactly the pre-overwrite content; current view: the v2 text
    val travel = IndexTable.readGeneration(spark, path, "t", genA)
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    assert(travel === stateA)
    val current = IndexTable.readLatest(spark, path, "t")
      .select($"page_content").as[String].collect()
    assert(current.exists(_.contains("updatedv2")) && travel != current.toSet)

    intercept[IllegalArgumentException] {
      IndexTable.readGeneration(spark, path, "t", 12345L)
    }

    // vacuum past retention retires gen A: catalog shrinks, as-of A throws
    IndexTable.vacuum(spark, path, "t", retainMillis = 0)
    assert(IndexTable.generations(spark, path, "t") === Seq(gensNow.head))
    intercept[IllegalArgumentException] {
      IndexTable.readGeneration(spark, path, "t", genA)
    }
  }

  test("tombstone delete: masks immediately, un-deletes on re-ingest, forgotten after compact+vacuum") {
    val path = java.nio.file.Files.createTempDirectory("compact_del").toString + "/idx"
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    val all = IndexTable.readLatest(spark, path, "t")
      .select($"id").as[String].collect().toSet
    val victims = all.toSeq.sorted.take(3)

    IndexTable.delete(spark, path, "t", victims)
    val served = IndexTable.readLatest(spark, path, "t")
      .select($"id").as[String].collect().toSet
    assert(served === all -- victims, "deleted ids must vanish from latest reads")
    // the serving schema is unchanged: no tombstone flag leaks out
    assert(!IndexTable.readLatest(spark, path, "t").columns.contains("is_deleted"))

    // a LATER re-ingest un-deletes (one last-write-wins total order)
    val back = victims.head
    val backPath = IndexTable.read(spark, path, "t")
      .where($"id" === back && !coalesce($"is_deleted", lit(false)))
      .select($"document_path").as[String].head()
    IndexTable.append(IndexTable.ingestRecords(
      docs.where($"document_path" === backPath), "t", pageSize = 32), path)
    val served2 = IndexTable.readLatest(spark, path, "t")
      .select($"id").as[String].collect().toSet
    assert(served2.contains(back))
    assert((victims.toSet - back).forall(!served2.contains(_)))

    // compact + zero-retention vacuum: the two still-deleted ids are gone
    // from EVERY byte on disk, not just from view. After vacuum(0) the only
    // bytes left are the single committed generation (physical view reads
    // it) and an empty delta zone — so physical-view absence IS disk absence.
    IndexTable.compact(spark, path, "t", retainMillis = 0L)
    val physical = IndexTable.read(spark, path, "t")
      .select($"id").as[String].collect().toSet
    assert((victims.toSet - back).forall(!physical.contains(_)),
      "forgotten ids must not survive anywhere on disk")
    assert(physical.contains(back))
    assert(genDirsFor(path, "t").size === 1, "exactly one generation remains")
    assert(parquetFiles(s"$path/index_alias=t") === 0,
      "no delta files (tombstone or data) survive the zero-retention vacuum")
  }

  test("tombstones mask their id in bucket-pruned reads (every probe set)") {
    val path = java.nio.file.Files.createTempDirectory("compact_del_b").toString + "/idx"
    val records = IndexTable.ingestRecords(docs, "t", pageSize = 32)
    IndexTable.appendBucketed(records, path, bits = 2, dim = 64)
    val probes = Seq("00", "01", "10", "11")
    val all = IndexTable.readLatestPruned(spark, path, "t", probes)
      .select($"id").as[String].collect().toSet
    val victim = all.toSeq.min
    IndexTable.delete(spark, path, "t", Seq(victim))
    val served = IndexTable.readLatestPruned(spark, path, "t", probes)
      .select($"id").as[String].collect().toSet
    assert(served === all - victim,
      "a tombstone (NULL bucket) must mask its id under full-probe pruning")
    // and under a partial probe set the victim must not reappear
    val partial = IndexTable.readLatestPruned(spark, path, "t", probes.take(2))
      .select($"id").as[String].collect().toSet
    assert(!partial.contains(victim))
  }
}
