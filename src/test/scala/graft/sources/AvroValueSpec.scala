package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure value-conversion edge cases for the Avro connector (no Spark). */
class AvroValueSpec extends AnyFunSuite {

  test("BYTES respects ByteBuffer position/limit (sliced buffers)") {
    val schema = org.apache.avro.Schema.create(org.apache.avro.Schema.Type.BYTES)
    val backing = "XXXXhelloYYYY".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // wrap exposes the FULL backing array via .array(); live region is 4..9
    val sliced = java.nio.ByteBuffer.wrap(backing, 4, 5)
    assert(AvroConnector.fromAvro(sliced, schema) == "hello")
    // buffer position is untouched (fromAvro must not consume it)
    assert(sliced.position() == 4 && sliced.remaining() == 5)
    // exact-fit buffer still round-trips
    val exact = java.nio.ByteBuffer.wrap(
      "hi".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(AvroConnector.fromAvro(exact, schema) == "hi")
  }
}
