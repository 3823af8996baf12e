package org.apache.spark.sql.hive.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** `HiveThriftServer2` (the class) is `private[hive]`, so code outside
  * this package tree can start it but not name the returned type. This
  * shim narrows the surface to start/stop. No Spark internals are
  * modified. */
object ThriftShim {
  /** Start the Thrift JDBC frontend over `session`; the returned handle
    * stops it. */
  def start(session: SparkSession): AutoCloseable = {
    val srv = HiveThriftServer2.startWithSparkSession(session, exitOnError = false)
    new AutoCloseable { override def close(): Unit = srv.stop() }
  }
}
