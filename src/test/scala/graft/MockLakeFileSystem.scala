package graft

import org.apache.hadoop.fs.RawLocalFileSystem

/** A non-`file:` Hadoop scheme backed by the local disk — what lets
  * GraftTableFsSpec prove the versioned-table facade's metadata IO
  * routes through the Hadoop FileSystem API end to end: a lingering
  * `java.io.File`/`java.nio` call anywhere on the metadata path would
  * choke on `mockfs:/...` path strings long before any assertion runs.
  * Registered per-test via `fs.mockfs.impl` in the session's Hadoop
  * configuration — the same mechanism that would configure s3a/abfs/gcs
  * connectors on a real cluster.
  */
class MockLakeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
