package graft.core

/** Shared log hygiene for the engine mains. */
object Logs {

  /** FileStreamSink's metadata probe on csv globs logs a benign WARN
    * with a full stack trace (adjudicated noise); lower that one logger
    * to ERROR so a non-empty stderr tail always means a real failure.
    * Best-effort: a swapped logging backend makes this a no-op. */
  def silenceBenignStreamingWarn(): Unit =
    scala.util.Try(org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
      org.apache.logging.log4j.Level.ERROR))
}
