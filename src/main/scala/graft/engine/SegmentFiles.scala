package graft.engine

/** Shared codec + recovery for self-describing parquet segment directories
  * (`seg-<min>-<max>-<count>`), used by both the per-MV [[ChangeLog]]
  * (offset-keyed) and [[LiveTable]] row history (seq-keyed). One place
  * owns the on-disk naming contract so the two restart-recovery paths
  * cannot drift: recovery needs no footer reads, and the staging→rename
  * commit keeps half-written segments invisible to it. */
private[engine] object SegmentFiles {

  /** (min, max, path, rowCount) — one segment's whole index entry. */
  type Seg = (Long, Long, String, Long)

  private val segName = """seg-(\d+)-(\d+)-(\d+)""".r

  def path(dir: String, min: Long, max: Long, n: Long): String =
    s"$dir/seg-$min-$max-$n"

  /** Rebuild the index from directory names, in key order. */
  def recover(dir: String): Seq[Seg] = {
    val f = new java.io.File(dir)
    if (!f.isDirectory) Nil
    else f.listFiles().toSeq.flatMap(s => s.getName match {
      case segName(min, max, n) =>
        Some((min.toLong, max.toLong, s.getAbsolutePath, n.toLong))
      case _ => None
    }).sortBy(_._1)
  }

  /** Atomic publish of a fully-written staging dir under its final name. */
  def commit(staging: String, path: String): Unit =
    if (!new java.io.File(staging).renameTo(new java.io.File(path)))
      throw new RuntimeException(s"segment rename failed: $staging -> $path")

  def delete(path: String): Unit = {
    scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively(); ()
  }
}
