package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Manifest-committed table sink — atomic snapshot publish over plain
  * parquet, the minimal transactional-layout pattern (what Delta/Iceberg
  * do with a log, reduced to one manifest file):
  *
  *  1. the new snapshot's files are written to a staging dir and MOVED
  *     into the table dir under unique names;
  *  2. the manifest (the list of live files) is written to a temp file and
  *     atomically RENAMED over `_manifest.json` — the single commit point.
  *
  * Readers resolve `_manifest.json` first and read ONLY its files, so a
  * writer that dies before the rename leaves stray data files but an
  * unchanged table: readers never observe a partial snapshot, and a crash
  * can be retried idempotently. On a real object store the rename becomes
  * the store's atomic put-if-absent/metadata swap; the protocol shape is
  * identical (ManifestSinkSpec simulates the crash).
  *
  * Scale notes: the data path is fully distributed (any partition count);
  * only the file LIST passes through the driver — manifest size is
  * O(files), the same driver-side cost every table format pays.
  */
object ManifestSink {

  private val ManifestName = "_manifest.json"

  def write(df: DataFrame, table: String): Unit = {
    val dir = Paths.get(table)
    Files.createDirectories(dir)
    val snapId = java.util.UUID.randomUUID().toString.take(8)
    val staging = dir.resolve(s"_staging_$snapId")
    df.write.parquet(staging.toString)
    val moved = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex.map { case (f, i) =>
        val target = dir.resolve(s"part-$snapId-$i.parquet")
        Files.move(f, target, StandardCopyOption.ATOMIC_MOVE)
        target.getFileName.toString
      }.toVector.sorted
    deleteRecursively(staging)
    commit(dir, moved)
  }

  /** The commit point: temp-write + atomic rename. */
  private def commit(dir: Path, files: Vector[String]): Unit = {
    val tmp = dir.resolve(s".$ManifestName.tmp")
    Files.writeString(tmp,
      files.map(f => "\"" + f + "\"").mkString("{\"files\": [", ", ", "]}"))
    Files.move(tmp, dir.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the committed snapshot — manifest-listed files ONLY; stray
    * files from dead writers are invisible. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val dir = Paths.get(table)
    val manifest = Files.readString(dir.resolve(ManifestName))
    val files = "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(manifest)
      .map(m => dir.resolve(m.group(1)).toString).toSeq
    require(files.nonEmpty, s"empty manifest in $table")
    spark.read.parquet(files: _*)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
