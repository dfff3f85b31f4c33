package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.PersistedBuild

/** The atomic-publish contract of [[graft.core.PersistedBuild]] (round-12
  * hardening of the round-11 readiness-marker contract): builds stage in a
  * hidden sibling and publish payload + marker in ONE rename, same-JVM
  * writers serialize per path, and a crashed writer leaves nothing at the
  * index path — so "marked but torn" can never exist on disk. */
class PersistedBuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsp(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
  private def markerExists(path: String): Boolean = {
    val (fs, p) = fsp(path)
    fs.exists(new org.apache.hadoop.fs.Path(p, PersistedBuild.MarkerName))
  }

  test("two writers racing one path: exactly one build, the loser adopts it, " +
      "and no state is visible at the path while the build is in flight") {
    val path = java.nio.file.Files.createTempDirectory("graft_pb_race")
      .toString + "/idx"
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val inWrite = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    def build(tag: String, hold: Boolean): Unit =
      PersistedBuild.ensure(spark, path) { stage =>
        writes.incrementAndGet()
        // two-table payload: a torn publish would be one table or a
        // missing marker — both are asserted impossible below
        Seq((1L, tag)).toDF("id", "who").write.parquet(s"$stage/t1")
        if (hold) { inWrite.countDown(); release.await() }
        Seq((2L, tag)).toDF("id", "who").write.parquet(s"$stage/t2")
      }
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val a = new Thread(() => try build("A", hold = true)
      catch { case t: Throwable => failed.set(t) })
    a.start()
    inWrite.await()
    // writer A is mid-build: NOTHING may be visible at the index path
    // (the round-11 in-place form had already deleted/was rewriting here)
    val (fs, p) = fsp(path)
    assert(!fs.exists(p), "an in-flight build must stay invisible at the path")
    release.countDown()
    // writer B races in; the per-path lock + marker re-check make it a
    // pure reader of A's publish
    build("B", hold = false)
    a.join()
    assert(failed.get() == null, s"writer A failed: ${failed.get()}")
    assert(writes.get() === 1, "exactly one build may run per path")
    assert(markerExists(path))
    val whos = (spark.read.parquet(s"$path/t1")
      unionByName spark.read.parquet(s"$path/t2"))
      .select($"who").as[String].collect().toSet
    assert(whos === Set("A"), "the published payload is the winner's, complete")
  }

  test("a writer that dies mid-build leaves NOTHING at the path; the next " +
      "caller rebuilds from scratch") {
    val path = java.nio.file.Files.createTempDirectory("graft_pb_crash")
      .toString + "/idx"
    intercept[RuntimeException] {
      PersistedBuild.ensure(spark, path) { stage =>
        Seq((1L, "dead")).toDF("id", "who").write.parquet(s"$stage/t1")
        throw new RuntimeException("writer died between tables")
      }
    }
    val (fs, p) = fsp(path)
    assert(!fs.exists(p),
      "a crashed build must leave no partial state at the index path")
    PersistedBuild.ensure(spark, path) { stage =>
      Seq((1L, "ok")).toDF("id", "who").write.parquet(s"$stage/t1")
      Seq((2L, "ok")).toDF("id", "who").write.parquet(s"$stage/t2")
    }
    assert(markerExists(path))
    assert(spark.read.parquet(s"$path/t2").select($"who").as[String].head() === "ok")
  }

  test("a pre-existing UNMARKED dir (torn or pre-marker-era) is swept and " +
      "replaced atomically; a marked one is never rebuilt") {
    val path = java.nio.file.Files.createTempDirectory("graft_pb_sweep")
      .toString + "/idx"
    Seq((9L, "junk")).toDF("id", "who").write.parquet(s"$path/t1")
    assert(!markerExists(path))
    val df = Seq((1L, "fresh")).toDF("id", "who")
    val got = PersistedBuild.table(df, path, spark)
    assert(got.select($"who").as[String].collect().toSeq === Seq("fresh"))
    assert(markerExists(path))
    // reuse contract: a poisoned rebuild closure must never run again
    val again = PersistedBuild.table(
      { throw new IllegalStateException("must not rebuild") }: org.apache.spark.sql.DataFrame,
      path, spark)
    assert(again.select($"who").as[String].collect().toSeq === Seq("fresh"))
  }

  test("markReady restores readiness after a single-writer in-place " +
      "overwrite (the streaming graph merge shape)") {
    val path = java.nio.file.Files.createTempDirectory("graft_pb_mark")
      .toString + "/idx"
    PersistedBuild.table(Seq((1L, "v1")).toDF("id", "who"), path, spark)
    // an in-place overwrite removes the marker together with the old files
    Seq((2L, "v2")).toDF("id", "who").write
      .mode("overwrite").parquet(path)
    assert(!markerExists(path), "overwrite must drop the stale marker")
    PersistedBuild.markReady(spark, path)
    assert(markerExists(path))
    // readiness holds: a later ensure is a pure reader of v2
    val got = PersistedBuild.table(
      { throw new IllegalStateException("must not rebuild") }: org.apache.spark.sql.DataFrame,
      path, spark)
    assert(got.select($"who").as[String].collect().toSeq === Seq("v2"))
  }

  test("N threads hammering ensure on a fresh path: one build, all readers " +
      "see the complete payload") {
    val path = java.nio.file.Files.createTempDirectory("graft_pb_hammer")
      .toString + "/idx"
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { i =>
      new Thread(() =>
        try PersistedBuild.ensure(spark, path) { stage =>
          writes.incrementAndGet()
          Seq((i.toLong, s"w$i")).toDF("id", "who").write.parquet(s"$stage/t1")
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"ensure threw: ${errs.peek()}")
    assert(writes.get() === 1)
    assert(markerExists(path))
    assert(spark.read.parquet(s"$path/t1").count() === 1L)
  }
}
