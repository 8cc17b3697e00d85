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

  test("assistantSpans: substr(flat, s+1, e-s) is the assistant content " +
      "verbatim for EVERY span (multi-assistant, system-headed); empty " +
      "and garbage rows yield empty/NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, """[{"role":"system","content":"sys"},{"role":"user","content":"q1"},{"role":"assistant","content":"first answer"},{"role":"user","content":"q2"},{"role":"assistant","content":"second"}]"""),
      (2L, """[{"role":"user","content":"no assistant here"}]"""),
      (3L, "garbage"))
    val df = Chat.assistantSpans(
      Chat.flatten(rows.toDF("id", "j"), "j"), "j")
    val out = df.select(col("id"), col("flat_text"), col("assistant_spans"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null
        else r.getSeq[org.apache.spark.sql.Row](2))).toList
    val (_, flat1, spans1) = out.find(_._1 == 1L).get
    assert(spans1.length == 2)
    val contents = spans1.map { sp =>
      val s = sp.getLong(0).toInt; val e = sp.getLong(1).toInt
      flat1.substring(s, e)
    }
    assert(contents == Seq("first answer", "second"))
    assert(out.find(_._1 == 2L).get._3.isEmpty)
    assert(out.find(_._1 == 3L).get._3 == null)
  }

  test("preferencePairs: top/bottom by score with deterministic " +
      "tie-breaks (chosen ties → lowest id, rejected → highest), " +
      "singleton prompts drop, margin exact") {
    import spark.implicits._
    val rows = Seq(
      // prompt A: clear winner/loser
      (1L, "A", "good", 9L), (2L, "A", "bad", 1L), (3L, "A", "mid", 5L),
      // prompt B: ALL TIED — chosen=lowest id, rejected=highest id
      (4L, "B", "b4", 3L), (5L, "B", "b5", 3L), (6L, "B", "b6", 3L),
      // prompt C: singleton — excluded
      (7L, "C", "alone", 8L)).toDF("id", "prompt", "resp", "score")
    val out = Chat.preferencePairs(rows, "prompt", "resp", "score", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out("A") == (("good", "bad", 8L)))
    assert(out("B") == (("b4", "b6", 0L)), "tied group: stable distinct pair")
    assert(!out.contains("C"))
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
