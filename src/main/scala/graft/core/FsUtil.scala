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

  /** Depth-first delete of a file or directory tree. */
  def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val all = Using.resource(Files.walk(p))(_.iterator().asScala.toVector)
      all.sorted(Ordering[Path].reverse).foreach(Files.deleteIfExists(_))
    }
}
