package graft.util

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Ships a Hadoop `Configuration` (not `java.io.Serializable` itself)
  * inside task closures via its own Writable encoding, so executors
  * resolve filesystems with the DRIVER's conf — credentials,
  * endpoints, scheme mappings — instead of a default-constructed one.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
