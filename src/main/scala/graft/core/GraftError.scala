package graft.core

/** Typed error taxonomy (U8), mirroring the reference's `TinyEtlError`
  * (`/root/reference/src/error.rs:3-45`). Fail-fast semantics: any of
  * these aborting a transfer surfaces to the CLI boundary, which logs
  * the message and exits 1 (main.rs:260-264 parity).
  *
  * The Rust enum's format-specific variants (Csv/Json/Database/Lua/Io)
  * collapse into the semantic ones here — Spark already wraps I/O and
  * format failures in its own exception types; what callers switch on
  * is the phase that failed.
  */
sealed abstract class GraftError(message: String, cause: Throwable)
    extends RuntimeException(message, cause) {
  /** Reference-style prefixed rendering (error.rs `#[error("...")]`). */
  def render: String
}

object GraftError {

  final case class Connection(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Connection error: $msg"
  }

  final case class SchemaInference(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Schema inference error: $msg"
  }

  final case class DataTransfer(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Data transfer error: $msg"
  }

  final case class Configuration(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Configuration error: $msg"
  }

  final case class Transform(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Transform error: $msg"
  }

  final case class DataValidation(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Data validation error: $msg"
  }

  final case class General(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause) {
    def render = s"Error: $msg"
  }
}
