package graft.sources

import scala.jdk.CollectionConverters._

/** Test bridge into [[MrTextSource.openedFiles]] (private[graft] — this
  * object lives in the same package from the test tree).
  */
object MrTextHookBridge {
  def reset(): Unit = MrTextSource.openedFiles.clear()
  def opened: Set[String] = MrTextSource.openedFiles.asScala.toSet
}
