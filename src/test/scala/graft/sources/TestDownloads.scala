package graft.sources

/** Shared probe for the protocol-layer download scratch dir — derives
  * the path from Connectors.localTmp so a layout change can't silently
  * turn the leak assertions into no-ops. */
object TestDownloads {
  def files(): Set[String] = {
    val d = Connectors.localTmp()
    val s = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSet
    } finally s.close()
  }
}
