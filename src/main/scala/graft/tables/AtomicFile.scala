package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}

/** Write-then-rename small-file publication — the one metadata-write
  * discipline every component shares (commit manifests, checkpoints,
  * index sync stamps): a crash mid-write must never leave a truncated
  * file at the final path. On POSIX/HDFS the rename is atomic; on S3 a
  * single-object copy-then-delete never exposes a partial destination.
  */
private[graft] object AtomicFile {

  /** Publish `bytes` at `dest`. `beforePublish` runs after the staged
    * write but immediately before the rename — the hook commit
    * tripwires use to shrink their TOCTOU window to the rename itself
    * (it may throw; the staged file is then removed and nothing is
    * published).
    */
  def write(fs: FileSystem, dest: Path, bytes: Array[Byte],
      beforePublish: () => Unit = () => ()): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
    // any failure before the rename removes the staged file — crashed
    // writes must not accumulate invisible .tmp garbage
    try {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      beforePublish()
    } catch { case e: Throwable => fs.delete(tmp, false); throw e }
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"atomic publish failed: $tmp → $dest")
  }
}
