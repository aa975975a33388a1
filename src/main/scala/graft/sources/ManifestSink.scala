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

  /** The commit point: version manifest, then pointer — each temp-write +
    * atomic rename. The version manifest is NEVER replace-moved: if two
    * writers race to the same version number, the second fails loudly with
    * FileAlreadyExistsException instead of silently clobbering the first
    * snapshot's file list. (The exists-check + rename pair leaves a
    * microscopic TOCTOU window on POSIX rename semantics — a real object
    * store closes it with put-if-absent; concurrent multi-writer commit is
    * otherwise out of contract, matching Delta's single-cluster caveat.) */
  private[graft] def commit(dir: Path, version: Int, files: Vector[String]): Unit = {
    val body = files.map(f => "\"" + f + "\"")
      .mkString(s"""{"version": $version, "files": [""", ", ", "]}")
    val vTarget = dir.resolve(versionName(version))
    if (Files.exists(vTarget))
      throw new java.nio.file.FileAlreadyExistsException(
        vTarget.toString, null, s"version $version already committed — concurrent writer?")
    val vtmp = dir.resolve(s".${versionName(version)}.tmp")
    Files.writeString(vtmp, body)
    Files.move(vtmp, vTarget, StandardCopyOption.ATOMIC_MOVE)
    val ptmp = dir.resolve(s".$PointerName.tmp")
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
