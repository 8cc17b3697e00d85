package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: every w-token window (token sequence at
    * stride 1) per doc with char bounds, duplicated iff the same
    * sequence appears in >= 2 distinct docs, keeper = min (id, start),
    * non-keeper windows merged into maximal intervals, excised via
    * plain string slicing. */
  private def bruteExcise(docs: Seq[(Long, String)], w: Int)
      : Map[Long, String] = {
    case class Win(id: Long, s: Int, e: Int, toks: Seq[String])
    val wins = docs.flatMap { case (id, text) =>
      // token runs of non-whitespace with char offsets
      val m = """\S+""".r.findAllMatchIn(text).toVector
      (0 to m.length - w).map { i =>
        Win(id, m(i).start, m(i + w - 1).end,
          m.slice(i, i + w).map(_.matched))
      }
    }
    val byContent = wins.groupBy(_.toks)
      .filter { case (_, ws) => ws.map(_.id).distinct.size >= 2 }
    val excised = byContent.values.toSeq.flatMap { ws =>
      val keeper = ws.minBy(x => (x.id, x.s))
      ws.filterNot(x => x.id == keeper.id && x.s == keeper.s)
    }
    val perDoc = excised.groupBy(_.id).map { case (id, ws) =>
      // merge overlapping/adjacent
      val sorted = ws.map(x => (x.s, x.e)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: t if s <= pe => (ps, math.max(pe, e)) :: t
          case _ => (s, e) :: acc
        }
      }.reverse
      id -> merged
    }
    docs.map { case (id, text) =>
      val cuts = perDoc.getOrElse(id, Nil)
      val sb = new StringBuilder
      var p = 0
      cuts.foreach { case (s, e) => sb.append(text.substring(p, s)); p = e }
      sb.append(text.substring(p))
      id -> sb.toString
    }.toMap
  }

  test("excise equals the brute-force reference on a planted corpus") {
    // passage long enough to span multiple windows; w small for the test
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha bravo charlie delta $passage echo foxtrot",
      2L -> s"golf hotel $passage india juliet kilo lima",
      3L -> s"mike november oscar papa quebec romeo sierra tango",
      4L -> s"$passage uniform victor whiskey xray yankee zulu omega",
      // whitespace variant: same token sequence, different separators —
      // must still match (normalized-content hashing)
      5L -> ("start  " + passage.replace(" ", "  ") + "\tend tail one two"))
    val w = 4
    val exp = bruteExcise(docs, w)
    val got = SubstringDedup.excise(docs.toDF("id", "text"), "id", "text",
        w = w, stride = 1)
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, _) =>
      assert(got(id) == exp(id), s"doc $id: got '${got(id)}'")
    }
    // persist=true (single window-hash evaluation) is output-identical
    val gotP = SubstringDedup.excise(docs.toDF("id", "text"), "id",
        "text", w = w, stride = 1, persist = true)
      .as[(Long, String)].collect().toMap
    assert(gotP == got, "persist must not change results")
    // sanity on the semantics themselves: doc 1 (keeper) intact, the
    // passage gone from 2 and 4, doc 3 untouched
    assert(got(1L) == docs.head._2)
    assert(!got(2L).contains("p1") && !got(4L).contains("p1"))
    assert(got(3L) == docs(2)._2)
  }

  test("adjacent and overlapping duplicated windows merge into one " +
      "maximal span; boundary windows differing per doc do not excise") {
    // two docs share a 6-token run; w=3 stride=1 → 4 shared windows
    // overlapping pairwise — they must excise as ONE span, exactly the
    // run, leaving no partial fragments
    val run = "one two three four five six"
    val a = s"A1 A2 $run A3"
    val b = s"B1 $run B2 B3"
    val got = SubstringDedup.excise(
      Seq(1L -> a, 2L -> b).toDF("id", "text"), "id", "text",
      w = 3, stride = 1)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == a, "keeper doc keeps the run")
    assert(got(2L) == "B1  B2 B3",
      s"non-keeper loses exactly the run: '${got(2L)}'")
  }

  test("whole-doc duplicate rebuilds to the empty string; short docs " +
      "and single-doc repeats stay untouched") {
    val text = "w1 w2 w3 w4 w5"
    val selfRepeat = "r1 r2 r3 r1 r2 r3" // within ONE doc only
    val got = SubstringDedup.excise(
      Seq(1L -> text, 2L -> text, 3L -> "tiny doc", 4L -> selfRepeat)
        .toDF("id", "text"), "id", "text", w = 5, stride = 1)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == text, "keeper survives")
    assert(got(2L) == "", "whole-doc duplicate becomes an auditable husk")
    assert(got(3L) == "tiny doc", "below w tokens: no windows, no change")
    assert(got(4L) == selfRepeat,
      "within-one-doc repeat is NOT cross-document — untouched")
  }

  test("spans reports merged non-keeper intervals with exact char bounds") {
    val run = "one two three four"
    val a = s"A1 $run"     // keeper (id 1)
    val b = s"BB $run tail"
    val out = SubstringDedup.spans(
      Seq(1L -> a, 2L -> b).toDF("id", "text"), "id", "text",
      w = 4, stride = 1)
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((2L, 3, 3 + run.length)),
      s"one span on doc 2 covering exactly the run: $out")
  }

  test("hot-hash guard: fail raises naming counts, warn/allow proceed") {
    // one 3-token passage in 5 docs → its window hash occurs 5 times
    val docs = (1L to 5L).map(i => i -> s"d$i filler hot hot hot")
      .toDF("id", "text")
    val e = intercept[graft.core.GraftError.DataValidation] {
      SubstringDedup.excise(docs, "id", "text", w = 3, stride = 1,
        maxOccurrences = 3, onHot = "fail").count()
    }
    assert(e.getMessage.contains("maxOccurrences=3") &&
      e.getMessage.contains("Boilerplate"))
    // warn (default) and allow both complete with identical output
    val warn = SubstringDedup.excise(docs, "id", "text", w = 3,
      stride = 1, maxOccurrences = 3, onHot = "warn")
      .as[(Long, String)].collect().toMap
    val allow = SubstringDedup.excise(docs, "id", "text", w = 3,
      stride = 1, maxOccurrences = 3, onHot = "allow")
      .as[(Long, String)].collect().toMap
    assert(warn == allow)
    assert(warn(1L).contains("hot hot hot") &&
      (2L to 5L).forall(i => !warn(i).contains("hot hot hot")))
  }

  test("token windows: codepoint offsets, surrogate pairs, stride") {
    import graft.functions.SketchExprs.tokenWindowHashes
    // 😀 is a surrogate pair — offsets must count CODEPOINTS so substr
    // coordinates line up with SQL semantics
    val text = "😀 aa bb cc"
    val rows = Seq(text).toDF("t")
      .select(explode(tokenWindowHashes(col("t"), 2, 1)).as("w"))
      .select(col("w")("s"), col("w")("e")).as[(Int, Int)].collect().toSeq
    // tokens at cp offsets: 😀[0,1) aa[2,4) bb[5,7) cc[8,10)
    assert(rows == Seq((0, 4), (2, 7), (5, 10)))
    // stride skips windows deterministically
    val strided = Seq("a b c d e").toDF("t")
      .select(explode(tokenWindowHashes(col("t"), 2, 2)).as("w"))
      .select(col("w")("s")).as[Int].collect().toSeq
    assert(strided == Seq(0, 4))
  }
}
