package graft.sources

/** Small local-filesystem helpers shared by the file-backed sinks/layouts
  * (test/local paths; object-store deployments use Delta/Iceberg instead).
  */
object FileUtils {
  /** Recursive delete; tolerates concurrent deletion (null listFiles). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}
