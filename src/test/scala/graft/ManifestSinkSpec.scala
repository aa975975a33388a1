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
}
