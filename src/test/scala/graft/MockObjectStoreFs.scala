package graft

import java.net.URI

/** A test-only Hadoop FileSystem under the non-file scheme `mock://` —
  * the offline-honest stand-in for an object-store connector (the
  * reference reads s3/gs/http for real, `util.rs:523-580`; this sandbox
  * has no connector jars). Extending RawLocalFileSystem means every
  * operation (list, open, create, rename-commit) runs the REAL Hadoop
  * FileSystem code paths Spark's parquet scan and committer use — only
  * the byte storage is local disk. `mock://bucket/<abs path>` maps to
  * the local `<abs path>`: the authority plays the bucket role exactly
  * like s3a, and the fixed getUri authority makes checkPath accept
  * bucket-qualified paths.
  *
  * Registered per-test via `fs.mock.impl` — the same deployment-config
  * mechanism an EMRFS-style custom FileSystem uses, which is what
  * [[Context.resolvePath]] consults before any scheme rewrite.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock://bucket/")
}
