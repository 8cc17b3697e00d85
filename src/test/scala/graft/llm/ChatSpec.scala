package graft.llm

import graft.SparkSpec

/** Chat-transcript validation/stats/flattening: verdict matrix over
  * the structural edge cases, exact flatten output, NULL propagation
  * for malformed JSON. */
class ChatSpec extends SparkSpec {

  private case class V(parsed: Boolean, turns: Option[Int],
                       assistant: Option[Int], aChars: Option[Long],
                       roles: Option[Boolean], alt: Option[Boolean])

  private def verdicts(jsons: (Long, String)*): Map[Long, V] = {
    import spark.implicits._
    Chat.stats(jsons.toDF("id", "j"), "j")
      .select("id", "parsed", "n_turns", "n_assistant", "assistant_chars",
        "roles_valid", "alternation_valid")
      .collect().map { r =>
        def oi(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
        def ol(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        def ob(i: Int) = if (r.isNullAt(i)) None else Some(r.getBoolean(i))
        r.getLong(0) -> V(r.getBoolean(1), oi(2), oi(3), ol(4), ob(5), ob(6))
      }.toMap
  }

  test("verdict matrix: valid pair, system head, alternation breaks, " +
      "unknown role, double system, empty array, garbage") {
    val out = verdicts(
      1L -> """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]""",
      2L -> """[{"role":"system","content":"be kind"},{"role":"user","content":"q"},{"role":"assistant","content":"a"}]""",
      3L -> """[{"role":"user","content":"a"},{"role":"user","content":"b"},{"role":"assistant","content":"c"}]""",
      4L -> """[{"role":"user","content":"q"},{"role":"bot","content":"r"}]""",
      5L -> """[{"role":"system","content":"x"},{"role":"system","content":"y"},{"role":"user","content":"q"},{"role":"assistant","content":"a"}]""",
      6L -> "[]",
      7L -> "definitely not json")
    assert(out(1L) == V(true, Some(2), Some(1), Some(5L), Some(true), Some(true)))
    assert(out(2L) == V(true, Some(3), Some(1), Some(1L), Some(true), Some(true)))
    assert(out(3L) == V(true, Some(3), Some(1), Some(1L), Some(true), Some(false)),
      "user-user-assistant must fail alternation")
    assert(out(4L).roles == Some(false) && out(4L).alt == Some(false))
    assert(out(5L).alt == Some(false), "system only at the head")
    assert(out(6L) == V(true, Some(0), Some(0), Some(0L), Some(true), Some(false)),
      "empty transcript: structurally parsed, nothing trainable")
    assert(out(7L).parsed == false && out(7L).turns.isEmpty &&
      out(7L).alt.isEmpty, "garbage JSON: NULL verdicts, not a crash")
  }

  test("odd body ending on user fails; null content fails roles_valid " +
      "but assistant_chars treats it as zero mass") {
    val out = verdicts(
      1L -> """[{"role":"user","content":"u1"},{"role":"assistant","content":"a1"},{"role":"user","content":"u2"}]""",
      2L -> """[{"role":"user","content":"q"},{"role":"assistant","content":null}]""")
    assert(out(1L).alt == Some(false))
    assert(out(2L).roles == Some(false) && out(2L).aChars == Some(0L) &&
      out(2L).alt == Some(true),
      "alternation is a role-order property; content nullity is roles_valid's")
  }

  test("flatten: role-tagged newline join, exact; NULL for garbage") {
    import spark.implicits._
    val out = Chat.flatten(Seq(
        (1L, """[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]"""),
        (2L, "nope")).toDF("id", "j"), "j")
      .select("id", "flat_text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("<|user|>hi\n<|assistant|>yo"))
    assert(out(2L).isEmpty)
  }
}
