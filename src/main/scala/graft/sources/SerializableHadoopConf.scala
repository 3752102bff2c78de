package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/**
 * Hadoop Configuration is not java-serializable; this box ships the DRIVER's
 * resolved conf (incl. `spark.hadoop.*` overrides — credentials, endpoints,
 * filesystem impls) to executor-side readers/writers, so the filesystem a
 * task opens is configured identically to the one planning used. A bare
 * `new Configuration()` on the executor silently drops those settings.
 */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
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
