package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access for state stores and table maintenance, routed
  * through the Hadoop `FileSystem` API of the active session's
  * configuration. `java.nio.file` only ever resolves against the
  * local POSIX filesystem, so state code built on it silently cannot
  * run against the HDFS/S3 stores a multi-executor deployment
  * implies; every path here is scheme-aware (`file:`, `hdfs:`,
  * `s3a:`, ...) and honors the session's Hadoop conf (credentials,
  * endpoints).
  */
object StoreFs {

  private def conf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf()), p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path); fs.exists(p)
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = resolve(path); fs.mkdirs(p)
  }

  /** Child entry names of `dir` (empty when the dir is absent). */
  def listNames(dir: String): Seq[String] = {
    val (fs, p) = resolve(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** All regular files under `dir`, recursively: (path, length). */
  def listFilesRecursive(dir: String): Seq[(String, Long)] = {
    val (fs, p) = resolve(dir)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val s = it.next()
        buf += ((s.getPath.toString, s.getLen))
      }
      buf.toSeq
    }
  }

  /** Create an empty marker file (parents created as needed). */
  def touch(path: String): Unit = {
    val (fs, p) = resolve(path)
    fs.create(p, true).close()
  }

  /** Atomic-on-HDFS directory/file rename; `false` if the FS refused
    * (e.g. destination exists on some schemes).
    */
  def rename(src: String, dst: String): Boolean = {
    val (fs, p) = resolve(src)
    fs.rename(p, new Path(dst))
  }

  def deleteRecursively(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
