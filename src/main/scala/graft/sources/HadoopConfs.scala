package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Ship the session's Hadoop configuration to executors as a plain
  * key-value snapshot (Configuration itself is not serializable, and
  * Spark's internal wrapper is private): without this, executor-side
  * filesystem access in custom readers/sinks would run on a
  * default-constructed Configuration and silently drop everything the
  * session set -- s3a credentials/endpoints, filesystem tuning,
  * kerberos realms -- which only works on a local FS.
  */
object HadoopConfs {

  /** Snapshot of every entry in the session's Hadoop conf (defaults
    * included: a few hundred small strings, serialized once per task
    * binary, not per row).
    */
  def snapshot(spark: SparkSession): Array[(String, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  /** Rebuild a Configuration from a snapshot, executor-side. */
  def build(props: Array[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    props.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
