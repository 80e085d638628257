package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local-filesystem wrapper whose `setTimes` THROWS — the object-store
  * simulation ConcurrencySpec's heartbeat-portability case runs the
  * registry on (S3A and friends either no-op or reject setTimes, and a
  * heartbeat built on it alone would let a live build look stale). The
  * scheme is NOT "file", so ArtifactCache's lease create takes its
  * FileSystem-generic branch, exactly as it would on a remote store.
  */
class NoSetTimesFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftnst"
  override def getUri: URI = URI.create("graftnst:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      "setTimes unsupported (object-store simulation)")
}
