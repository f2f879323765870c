package graft.ml

import java.io.{FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths}

/** Trained-filter persistence (`data_manager/filter_serializer.py:7-62` —
  * the reference pickles the whole filter object graph to a `.filter`
  * file). Here the StarsFilterModel object graph (descriptors + decider
  * models, all Serializable because they ship to executors anyway) is
  * java-serialized; MLlib model internals ride along.
  */
object FilterSerializer {

  def save(model: StarsFilterModel, path: String): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val out = new ObjectOutputStream(new FileOutputStream(path))
    try out.writeObject(model) finally out.close()
  }

  def load(path: String): StarsFilterModel = {
    val in = new ObjectInputStream(new FileInputStream(path))
    try in.readObject().asInstanceOf[StarsFilterModel] finally in.close()
  }
}
