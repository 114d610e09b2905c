package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Filesystem helpers that never leak the `Files.list`/`Files.walk`
  * directory streams (each holds an open file descriptor until closed;
  * long-running streaming queries call these every micro-batch). */
object FsUtil {

  /** Eagerly list a directory's entries, closing the stream. */
  def listDir(dir: Path): Vector[Path] =
    if (!Files.isDirectory(dir)) Vector.empty
    else Using.resource(Files.list(dir))(_.iterator().asScala.toVector)

  /** `listDir` sorted by path name. */
  def listDirSorted(dir: Path): Vector[Path] = listDir(dir).sorted

  /** O(listing) snapshot fingerprint of a file or directory tree:
    * regular-file count, newest modification time, and total bytes. Any
    * rewrite of a dataset directory (new files, appended files, touched
    * files) changes it; reading no data keeps it cheap enough to probe
    * on every cache lookup. Used to invalidate per-corpus memoizations
    * (ANN trainings, persisted index fixtures) when the data under a
    * path is regenerated within one JVM lifetime. */
  def snapshotFingerprint(p: Path): String =
    if (!Files.exists(p)) "absent"
    else {
      val files = Using.resource(Files.walk(p))(
        _.iterator().asScala.filter(Files.isRegularFile(_)).toVector)
      val (n, maxM, bytes) = files.foldLeft((0L, 0L, 0L)) { case ((c, m, b), f) =>
        (c + 1, math.max(m, Files.getLastModifiedTime(f).toMillis), b + Files.size(f))
      }
      s"$n:$maxM:$bytes"
    }

  /** Depth-first delete of a file or directory tree. */
  def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val all = Using.resource(Files.walk(p))(_.iterator().asScala.toVector)
      all.sorted(Ordering[Path].reverse).foreach(Files.deleteIfExists(_))
    }
}
