package graft.ckpt

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped (snapshot + manifest) catalog over a filesystem
  * (SURVEY §7.0: no Iceberg runtime jar in the sandbox, so this implements
  * the same commit contract — write data files first, commit a manifest
  * atomically last — against any Hadoop-compatible path; a real Iceberg
  * catalog drops in behind the same three calls on a cluster).
  *
  * Layout:
  *   root/<table>/snap-<id>/          parquet data files (written by Spark)
  *   root/<table>/meta/manifest-<id>.json   commit record (atomic rename)
  *
  * A snapshot is visible iff its manifest exists; half-written data dirs
  * are ignored — which is exactly the resume-after-kill guarantee the
  * north rule asks for. */
final class Catalog(rootDir: String) extends Serializable {
  private def meta(table: String): Path = Paths.get(rootDir, table, "meta")
  private def dataDir(table: String, id: Long): Path =
    Paths.get(rootDir, table, s"snap-$id")

  /** Write `df` as snapshot `id` of `table`; commit is the atomic manifest
    * rename, performed only after the parquet write succeeded. */
  def writeSnapshot(df: DataFrame, table: String, id: Long): Unit = {
    val dir = dataDir(table, id)
    df.write.mode("overwrite").parquet(dir.toString)
    Files.createDirectories(meta(table))
    val files = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    val manifest =
      s"""{"snapshot":$id,"data":"${dir.getFileName}","files":[${files.map("\"" + _ + "\"").mkString(",")}],"committed_ms":${System.currentTimeMillis()}}"""
    val tmp = meta(table).resolve(s".manifest-$id.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, meta(table).resolve(s"manifest-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Ids of committed snapshots (manifest present), ascending. */
  def snapshots(table: String): Seq[Long] = {
    val m = meta(table)
    if (!Files.isDirectory(m)) return Seq.empty
    Files.list(m).iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong
      }.toSeq.sorted
  }

  def latestSnapshot(table: String): Option[Long] = snapshots(table).lastOption

  def readSnapshot(spark: SparkSession, table: String, id: Long): DataFrame =
    spark.read.parquet(dataDir(table, id).toString)

  /** Append rows to a log-style table (each append = one new snapshot). */
  def append(df: DataFrame, table: String): Unit =
    writeSnapshot(df, table, latestSnapshot(table).getOrElse(-1L) + 1L)

  /** Read the union of all committed snapshots of a log-style table. */
  def readAll(spark: SparkSession, table: String): Option[DataFrame] = {
    val ids = snapshots(table)
    if (ids.isEmpty) None
    else Some(ids.map(readSnapshot(spark, table, _)).reduce(_ unionByName _))
  }
}
