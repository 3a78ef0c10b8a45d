package graft.sources.kvbin

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which itself
  * is a `Writable`, not `Serializable`). The session's
  * `hadoopConfiguration` travels inside read partitions and write
  * closures through this wrapper, so cluster-specific filesystem
  * settings and credentials (s3a keys, HDFS nameservices, …) reach the
  * executors — a bare `new Configuration()` on an executor only sees
  * default-config filesystems. */
class SerializableConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
