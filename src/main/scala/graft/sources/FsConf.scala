package graft.sources

import org.apache.hadoop.conf.Configuration

/** One shared Hadoop Configuration for FILESYSTEM RESOLUTION (guide §5 —
  * driver work between jobs): `FileSystem.get` caches instances per
  * (scheme, authority, ugi), so the Configuration passed in matters only
  * the first time a scheme is resolved — but constructing `new
  * Configuration()` per call re-parses the Hadoop default XML resources
  * every time (~ms each). The engine's driver-side verbs (ledger reads,
  * catalog ops, staged commits) resolve a FileSystem dozens of times per
  * query; jstack sampling attributed ~20% of the v-family's inter-job
  * driver time to these constructors (OPTIMIZATION_r21.md).
  *
  * Resolution prefers the running session's `hadoopConfiguration` (so
  * `spark.hadoop.*` settings — `fs.file.impl` →
  * [[NioLocalFileSystem]], object-store credentials — apply if this
  * call is the scheme's first), falling back to one cached bare
  * Configuration outside any session (plain unit-test code paths,
  * executor-side readers without a thread-local session).
  *
  * READ-ONLY BY CONTRACT: callers pass this to `Path.getFileSystem` /
  * `FileSystem.get` and must never mutate it — code that needs to set
  * properties builds its own copy. */
private[graft] object FsConf {
  private lazy val fallback = new Configuration()

  def get: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(fallback)
}
