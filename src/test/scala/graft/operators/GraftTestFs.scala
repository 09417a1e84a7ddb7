package graft.operators

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A second hadoop filesystem SCHEME backed by the local disk, so specs
  * can drive "same path, different filesystem" cases (the checkpoint-dir
  * URI comparison) without a real HDFS/s3a in the container. Registered
  * per-test via `fs.graftfs.impl` in the hadoop configuration.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
}
