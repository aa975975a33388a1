package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Manifest-committed table sink — atomic, VERSIONED snapshot publish over
  * plain parquet: the minimal transactional-layout pattern (what
  * Delta/Iceberg do with a log, reduced to one manifest file per version
  * plus a current-pointer):
  *
  *  1. the new snapshot's files are written to a staging dir and MOVED
  *     into the table dir under unique names;
  *  2. the version manifest `_manifest_v{N}.json` (the list of live files)
  *     is written to a temp file and atomically renamed into place;
  *  3. the current-pointer `_manifest.json` is atomically RENAMED over —
  *     the single commit point.
  *
  * Readers resolve a manifest first and read ONLY its files, so a writer
  * that dies before the final rename leaves stray data files but an
  * unchanged table: readers never observe a partial snapshot, and a crash
  * can be retried idempotently. Old versions stay readable (`readAsOf`)
  * until `vacuum` drops their manifests and any data files no retained
  * snapshot references — the Delta/Iceberg time-travel + VACUUM contract.
  * On a real object store the renames become the store's atomic
  * put-if-absent/metadata swap; the protocol shape is identical
  * (ManifestSinkSpec simulates the crash).
  *
  * Scale notes: the data path is fully distributed (any partition count);
  * only the file LIST passes through the driver — manifest size is
  * O(files), the same driver-side cost every table format pays. Vacuum's
  * reachability set is manifest-sized, never data-sized.
  */
object ManifestSink {

  private val PointerName = "_manifest.json"
  private def versionName(v: Int) = s"_manifest_v$v.json"
  private val VersionRe = "_manifest_v(\\d+)\\.json".r

  /** Files.list returns a stream holding a directory handle — always close. */
  private def listDir[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Publish a new snapshot; returns its version (1-based). */
  def write(df: DataFrame, table: String): Int = {
    val dir = Paths.get(table)
    Files.createDirectories(dir)
    val snapId = java.util.UUID.randomUUID().toString.take(8)
    val staging = dir.resolve(s"_staging_$snapId")
    df.write.parquet(staging.toString)
    val moved = listDir(staging) { files =>
      files.filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.map { case (f, i) =>
          val target = dir.resolve(s"part-$snapId-$i.parquet")
          Files.move(f, target, StandardCopyOption.ATOMIC_MOVE)
          target.getFileName.toString
        }.toVector
    }.sorted
    deleteRecursively(staging)
    val version = versions(table).lastOption.getOrElse(0) + 1
    try commit(dir, version, moved)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        // lost a version race: this snapshot's data files are referenced
        // by no manifest — remove them so a retry loop can't leak a full
        // snapshot's parquet per collision
        moved.foreach(f => Files.deleteIfExists(dir.resolve(f)))
        throw e
    }
    version
  }

  /** The commit point: claim the version with put-if-absent, fill it with
    * an atomic rename, then swing the pointer.
    *
    *  - The CLAIM is `Files.createFile` — O_EXCL, so exactly one of two
    *    writers racing the same version number wins at the filesystem, no
    *    exists-check TOCTOU (POSIX rename() always replaces, so a no-replace
    *    rename cannot be the claim). The loser fails loudly with
    *    FileAlreadyExistsException. On a real object store this is the
    *    store's put-if-absent.
    *  - The FILL writes the body to a tmp named with a per-writer token
    *    (a shared tmp name would let a racing writer clobber this writer's
    *    staged bytes between write and move) and atomically renames it over
    *    the claimed file — readers see the manifest appear empty-then-full,
    *    never partially written. A crash between claim and fill leaves an
    *    empty claimed version: never pointed at, unreadable via readAsOf
    *    (empty-manifest guard), skipped past by the next writer's
    *    read-increment, and vacuumable.
    *  - The POINTER swap is the single commit point for `read`, also via
    *    token-unique tmp + atomic replace-rename. */
  private[graft] def commit(dir: Path, version: Int, files: Vector[String]): Unit = {
    val body = files.map(f => "\"" + f + "\"")
      .mkString(s"""{"version": $version, "files": [""", ", ", "]}")
    val token = java.util.UUID.randomUUID().toString.take(8)
    val vTarget = dir.resolve(versionName(version))
    try Files.createFile(vTarget)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.nio.file.FileAlreadyExistsException(
          vTarget.toString, null, s"version $version already committed — concurrent writer?")
    }
    val vtmp = dir.resolve(s".${versionName(version)}.$token.tmp")
    Files.writeString(vtmp, body)
    Files.move(vtmp, vTarget,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val ptmp = dir.resolve(s".$PointerName.$token.tmp")
    Files.writeString(ptmp, body)
    Files.move(ptmp, dir.resolve(PointerName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed versions, ascending. */
  def versions(table: String): Seq[Int] = {
    val dir = Paths.get(table)
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir) { files =>
      files.flatMap(p => VersionRe.findFirstMatchIn(p.getFileName.toString))
        .map(_.group(1).toInt).toSeq
    }.sorted
  }

  private def filesOf(dir: Path, manifest: Path): Seq[String] = {
    val body = Files.readString(manifest)
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(body)
      .map(m => m.group(1)).toSeq
  }

  /** Read the current committed snapshot — manifest-listed files ONLY;
    * stray files from dead writers are invisible. */
  def read(spark: SparkSession, table: String): DataFrame =
    readManifest(spark, table, Paths.get(table).resolve(PointerName))

  /** Time travel: read snapshot `version` as committed. */
  def readAsOf(spark: SparkSession, table: String, version: Int): DataFrame =
    readManifest(spark, table, Paths.get(table).resolve(versionName(version)))

  private def readManifest(spark: SparkSession, table: String,
      manifest: Path): DataFrame = {
    val dir = Paths.get(table)
    val files = filesOf(dir, manifest).map(f => dir.resolve(f).toString)
    require(files.nonEmpty, s"empty manifest $manifest")
    spark.read.parquet(files: _*)
  }

  /** Row-level diff between two committed snapshots: what did version
    * `to` add and remove relative to version `from`? Keyless multiset
    * semantics via exceptAll both ways (a row appearing twice in `to` and
    * once in `from` diffs as one 'added'), so it needs no primary-key
    * contract — the audit tool for "what changed between yesterday's and
    * today's corpus snapshot".
    *
    * Scale: exceptAll hash-partitions both sides on the full row — one
    * shuffle each way, no driver materialization, and version manifests
    * mean each side scans ONLY its snapshot's files (no directory
    * listing of dead data). With a known key, an outer join on the key
    * would replace the full-row shuffle; this is the general form. */
  def snapshotDiff(spark: SparkSession, table: String, from: Int, to: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = readAsOf(spark, table, from)
    val b = readAsOf(spark, table, to)
    b.exceptAll(a).withColumn("change", lit("added"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("removed")))
  }

  /** Drop all but the newest `keep` versions and every data file no
    * retained snapshot references. Current pointer is untouched (it always
    * references the newest version, which is always retained). */
  def vacuum(table: String, keep: Int = 1): Unit = {
    require(keep >= 1, "must retain at least the current snapshot")
    val dir = Paths.get(table)
    val all = versions(table)
    val (dropped, retained) = all.splitAt(math.max(all.length - keep, 0))
    val live = retained.flatMap(v => filesOf(dir, dir.resolve(versionName(v)))).toSet
    dropped.foreach { v =>
      val dead = filesOf(dir, dir.resolve(versionName(v))).filterNot(live)
      dead.foreach(f => Files.deleteIfExists(dir.resolve(f)))
      Files.deleteIfExists(dir.resolve(versionName(v)))
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
