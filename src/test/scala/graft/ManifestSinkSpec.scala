package graft

import graft.sources.ManifestSink
import java.nio.file.{Files, Paths}

/** Atomic-publish semantics: readers see committed snapshots only. */
class ManifestSinkSpec extends SparkSuite {
  import spark.implicits._

  test("snapshot publish is atomic: stray files from a dead writer are invisible") {
    val table = Files.createTempDirectory("manifest_tbl").toString
    ManifestSink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), table)
    assert(ManifestSink.read(spark, table).count() === 2)

    // simulate a writer that died after moving data files but BEFORE the
    // manifest rename: a stray parquet lands in the table dir
    Seq((99L, "stray")).toDF("id", "v").write
      .parquet(Paths.get(table, "_staging_dead").toString)
    val stray = Files.list(Paths.get(table, "_staging_dead")).iterator()
    var i = 0
    while (stray.hasNext) {
      val f = stray.next()
      if (f.getFileName.toString.endsWith(".parquet")) {
        Files.move(f, Paths.get(table, s"part-dead-$i.parquet")); i += 1
      }
    }
    // reader still sees only the committed snapshot
    val rows = ManifestSink.read(spark, table).collect()
    assert(rows.length === 2)
    assert(!rows.map(_.getLong(0)).contains(99L))

    // a successful second write REPLACES the snapshot (and the reader
    // flips atomically to it)
    ManifestSink.write(Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("id", "v"), table)
    val v2 = ManifestSink.read(spark, table).collect().map(_.getLong(0)).toSet
    assert(v2 === Set(10L, 11L, 12L))
  }

  test("version collision fails loudly instead of clobbering the earlier snapshot") {
    val table = Files.createTempDirectory("manifest_race").toString
    ManifestSink.write(Seq((1L, "a")).toDF("id", "v"), table)
    val dir = Paths.get(table)
    // two writers raced read-then-increment and both computed version 2;
    // the second commit must throw, not silently replace the first
    // writer's file list (the lost-snapshot regression from ADVICE r3)
    ManifestSink.commit(dir, 2, Vector("part-w1-0.parquet"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      ManifestSink.commit(dir, 2, Vector("part-w2-0.parquet"))
    }
    // the first writer's manifest is untouched
    assert(Files.readString(dir.resolve("_manifest_v2.json"))
      .contains("part-w1-0.parquet"))
    // and a subsequent writer moves past the collision (version 3)
    assert(ManifestSink.write(Seq((3L, "c")).toDF("id", "v"), table) === 3)
  }

  test("two writers racing the same version: exactly one wins, no mixed manifest, no orphans") {
    // the put-if-absent claim (Files.createFile, O_EXCL) decides the race
    // at the filesystem — run the commit-level race many times with a
    // barrier start; every round must produce ONE winner whose complete
    // file list is the committed body (a shared tmp path used to allow the
    // loser to clobber the winner's staged bytes)
    val table = Files.createTempDirectory("manifest_race2").toString
    val dir = Paths.get(table)
    for (round <- 1 to 25) {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, String]]()
      val threads = Seq("w1", "w2").map { w =>
        new Thread(() => {
          barrier.await()
          try {
            graft.sources.ManifestSink.commit(dir, round, Vector(s"part-$w-$round.parquet"))
            outcomes.add(Right(w))
          } catch { case t: Throwable => outcomes.add(Left(t)) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val (losers, winners) = outcomes.asScala.toList.partition(_.isLeft)
      assert(winners.size === 1, s"round $round: ${outcomes.asScala.toList}")
      assert(losers.size === 1)
      losers.head.left.foreach(t =>
        assert(t.isInstanceOf[java.nio.file.FileAlreadyExistsException]))
      val winner = winners.head.toOption.get
      val body = Files.readString(dir.resolve(s"_manifest_v$round.json"))
      // the committed manifest is EXACTLY the winner's list — not the
      // loser's, not empty, not a mix
      assert(body.contains(s"part-$winner-$round.parquet"), body)
      val other = if (winner == "w1") "w2" else "w1"
      assert(!body.contains(s"part-$other-$round.parquet"), body)
      // no tmp litter survives either writer
      val tmps = Files.list(dir).iterator().asScala
        .count(_.getFileName.toString.endsWith(".tmp"))
      assert(tmps === 0)
    }
  }

  test("write-level version race leaves zero orphaned parquet") {
    val table = Files.createTempDirectory("manifest_race3").toString
    ManifestSink.write(Seq((1L, "a")).toDF("id", "v"), table)
    val dir = Paths.get(table)
    // force both writers to compute the same next version: pre-stage both
    // data file sets, then race the commits; the loser's write() path
    // deletes its unreferenced parquet
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("a", "b").map { w =>
      new Thread(() => {
        barrier.await()
        try ManifestSink.write(Seq((2L, w)).toDF("id", "v"), table)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    // both may succeed (they serialized onto different versions) or one
    // lost a same-version race and threw; either way every parquet on disk
    // must be referenced by some version manifest
    assert(errs.asScala.forall(_.isInstanceOf[java.nio.file.FileAlreadyExistsException]),
      errs.asScala.toList.toString)
    val manifests = ManifestSink.versions(table)
      .map(v => Files.readString(dir.resolve(s"_manifest_v$v.json")))
    val referenced = manifests.flatMap(
      "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(_).map(_.group(1))).toSet
    val onDisk = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    assert(onDisk === referenced,
      s"orphans: ${onDisk -- referenced}, missing: ${referenced -- onDisk}")
  }

  test("multi-partition writes list every file in the manifest") {
    val table = Files.createTempDirectory("manifest_multi").toString
    ManifestSink.write((1L to 100L).toDF("id").repartition(5), table)
    val manifest = Files.readString(Paths.get(table, "_manifest.json"))
    assert("\\.parquet".r.findAllIn(manifest).size === 5)
    assert(ManifestSink.read(spark, table).count() === 100)
  }

  test("time travel: every committed version stays readable as published") {
    val table = Files.createTempDirectory("manifest_tt").toString
    val v1 = ManifestSink.write(Seq((1L, "a")).toDF("id", "v"), table)
    val v2 = ManifestSink.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), table)
    val v3 = ManifestSink.write(Seq((4L, "d")).toDF("id", "v"), table)
    assert((v1, v2, v3) === (1, 2, 3))
    assert(ManifestSink.versions(table) === Seq(1, 2, 3))
    assert(ManifestSink.readAsOf(spark, table, 1).collect()
      .map(_.getLong(0)).toSet === Set(1L))
    assert(ManifestSink.readAsOf(spark, table, 2).collect()
      .map(_.getLong(0)).toSet === Set(2L, 3L))
    // current pointer tracks the newest version
    assert(ManifestSink.read(spark, table).collect()
      .map(_.getLong(0)).toSet === Set(4L))
  }

  test("vacuum drops old snapshots' manifests and unreferenced data files") {
    val table = Files.createTempDirectory("manifest_vac").toString
    ManifestSink.write(Seq((1L, "a")).toDF("id", "v"), table)
    ManifestSink.write(Seq((2L, "b")).toDF("id", "v"), table)
    ManifestSink.write(Seq((3L, "c")).toDF("id", "v"), table)
    val before = Files.list(Paths.get(table)).iterator()
    var parquetBefore = 0
    while (before.hasNext)
      if (before.next().getFileName.toString.endsWith(".parquet")) parquetBefore += 1
    assert(parquetBefore === 3)

    ManifestSink.vacuum(table, keep = 1)
    assert(ManifestSink.versions(table) === Seq(3))
    val after = Files.list(Paths.get(table)).iterator()
    var parquetAfter = 0
    while (after.hasNext)
      if (after.next().getFileName.toString.endsWith(".parquet")) parquetAfter += 1
    assert(parquetAfter === 1)
    // latest still reads; vacuumed version is gone
    assert(ManifestSink.read(spark, table).collect()
      .map(_.getLong(0)).toSet === Set(3L))
    intercept[Exception](ManifestSink.readAsOf(spark, table, 1).collect())
  }

  test("snapshot diff reports multiset adds and removes between versions") {
    val table = Files.createTempDirectory("manifest_diff").toString
    // v1: {1,2,2,3}; v2: {2,3,3,4} -> added {3,4}, removed {1,2}
    ManifestSink.write(Seq((1L, "a"), (2L, "b"), (2L, "b"), (3L, "c"))
      .toDF("id", "v"), table)
    ManifestSink.write(Seq((2L, "b"), (3L, "c"), (3L, "c"), (4L, "d"))
      .toDF("id", "v"), table)
    val diff = ManifestSink.snapshotDiff(spark, table, from = 1, to = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(diff.count(_._3 == "added") === 2)
    assert(diff.count(_._3 == "removed") === 2)
    assert(diff.filter(_._3 == "added").map(_._1).sorted.toSeq === Seq(3L, 4L))
    assert(diff.filter(_._3 == "removed").map(_._1).sorted.toSeq === Seq(1L, 2L))
    // identical versions diff empty
    assert(ManifestSink.snapshotDiff(spark, table, 2, 2).count() === 0)
  }
}
