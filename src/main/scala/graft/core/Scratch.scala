package graft.core

import java.io.File
import java.nio.file.Files

/** JVM-scoped scratch directories for queries that materialize an
  * intermediate layout (a clustered ANN index, a CDC wire hop). Each call
  * returns a FRESH directory — a fixed shared path would let a second
  * process overwrite the layout mid-read of another's lazy scan — and
  * every directory is deleted on JVM exit, so repeated bench/verify
  * iterations don't accumulate copies in the temp filesystem. */
object Scratch {

  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    val f = p.toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(f)))
    p.toString
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
