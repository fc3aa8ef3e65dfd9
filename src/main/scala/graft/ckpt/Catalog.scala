package graft.ckpt

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * north rule asks for.
  *
  * All metadata I/O goes through the Hadoop FileSystem API resolved from
  * the root path's scheme (file://, hdfs://, s3a://, ...), the same
  * filesystem Spark writes the data files to — nothing here assumes a
  * local disk. The manifest rename is atomic on local/HDFS; on object
  * stores it is copy+delete, which is why real Iceberg commits via a
  * catalog service there — same caveat, same seam. */
final class Catalog(rootDir: String) extends Serializable {
  private def fs(): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration).getOrElse(new Configuration())
    new HPath(rootDir).getFileSystem(conf) // cached per scheme+authority
  }
  private def meta(table: String): HPath = new HPath(rootDir, s"$table/meta")
  private def dataDir(table: String, id: Long): HPath =
    new HPath(rootDir, s"$table/snap-$id")

  /** Write `df` as snapshot `id` of `table`; commit is the atomic manifest
    * rename, performed only after the parquet write succeeded. */
  def writeSnapshot(df: DataFrame, table: String, id: Long): Unit = {
    val dir = dataDir(table, id)
    df.write.mode("overwrite").parquet(dir.toString)
    val f = fs()
    f.mkdirs(meta(table))
    val files = f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    val manifest =
      s"""{"snapshot":$id,"data":"${dir.getName}","files":[${files.map("\"" + _ + "\"").mkString(",")}],"committed_ms":${System.currentTimeMillis()}}"""
    val tmp = new HPath(meta(table), s".manifest-$id.tmp")
    val out = f.create(tmp, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = new HPath(meta(table), s"manifest-$id.json")
    f.delete(dst, false) // re-commit of the same id replaces its manifest
    require(f.rename(tmp, dst), s"manifest commit rename failed: $tmp -> $dst")
  }

  /** Ids of committed snapshots (manifest present), ascending. */
  def snapshots(table: String): Seq[Long] = {
    val m = meta(table)
    val f = fs()
    if (!f.exists(m)) return Seq.empty
    f.listStatus(m).map(_.getPath.getName)
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
