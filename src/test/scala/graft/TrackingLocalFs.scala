package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import java.net.URI

/** Local filesystem shim with OBJECT-STORE rename semantics: any attempt
  * to rename a DIRECTORY outside the Spark task committer's private
  * `_temporary` area throws — an object store has no atomic directory
  * rename (S3A emulates one as per-object copy+delete), so an engine
  * whose reader-visible state depends on it is broken on the
  * reference's own deployment target (s3a://MinIO). The committer's
  * internal `_temporary` renames are exempt: production S3 deployments
  * swap those for an S3A committer, which is write-mechanics below the
  * engine's protocol.
  *
  * Registered under scheme `graftfs` via
  * `conf.set("fs.graftfs.impl", classOf[TrackingLocalFs].getName)`.
  */
class TrackingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val isDir =
      try getFileStatus(src).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (isDir) {
      val committerInternal = src.toString.contains("_temporary") ||
        dst.toString.contains("_temporary")
      TrackingLocalFs.record(src.toString, dst.toString, committerInternal)
      if (!committerInternal)
        throw new java.io.IOException(
          s"simulated object store: no atomic directory rename ($src → $dst)")
    }
    super.rename(src, dst)
  }
}

object TrackingLocalFs {
  private val renames =
    scala.collection.mutable.ListBuffer.empty[(String, String, Boolean)]

  private[graft] def record(src: String, dst: String,
      committerInternal: Boolean): Unit =
    synchronized { renames += ((src, dst, committerInternal)) }

  def reset(): Unit = synchronized(renames.clear())

  /** Directory renames the ENGINE attempted (committer-internal ones
    * excluded). Must stay empty across the whole table lifecycle.
    */
  def engineDirRenames: Seq[(String, String)] =
    synchronized(renames.filterNot(_._3).map(r => (r._1, r._2)).toList)
}
