package graft

import graft.core.TinyType
import graft.infer.{CellInference, DateFormats}

import java.time.{LocalDateTime, ZoneOffset}
import org.scalacheck.Gen

/** Property-based pins for the semantics-heaviest pure code (SURVEY §5
  * prescribes ScalaCheck for the date-parser and cell-typing lattices;
  * raw Gen sampling — the scalatest bridge artifact is not in the
  * offline cache). */
class PropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 200)
                           (f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n)(f.tupled)

  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 200)
                              (f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }

  private val sane = for {
    y <- Gen.choose(1971, 2069); mo <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
    mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield LocalDateTime.of(y, mo, d, h, mi, s)

  test("date parser: every date-only format round-trips the date fields") {
    val fmts = Seq("yyyy-M-d", "M/d/yyyy", "d.M.yyyy", "yyyy/M/d", "yyyy.M.d")
    forAll2(sane, Gen.oneOf(fmts)) { (dt, f) =>
      val s = dt.toLocalDate.format(
        java.time.format.DateTimeFormatter.ofPattern(f))
      val parsed = DateFormats.tryParse(s)
      assert(parsed.isDefined, s"'$s' ($f) failed to parse")
      val back = LocalDateTime.ofInstant(parsed.get, ZoneOffset.UTC)
      assert(back.toLocalDate == dt.toLocalDate, s"'$s' ($f) → $back")
      assert(back.toLocalTime == java.time.LocalTime.MIDNIGHT)
    }
  }

  test("date parser: iso datetime without tz is assumed UTC, exact") {
    forAll(sane) { dt =>
      val s = dt.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      val parsed = DateFormats.tryParse(s)
      assert(parsed.contains(dt.toInstant(ZoneOffset.UTC)), s"'$s' → $parsed")
    }
  }

  test("date parser: ambiguity resolves month-first (M/d before d/M)") {
    forAll3(Gen.choose(1, 12), Gen.choose(1, 12), Gen.choose(1971, 2069)) {
      (a, b, y) =>
        val parsed = DateFormats.tryParse(s"$a/$b/$y")
        assert(parsed.isDefined)
        val back = LocalDateTime.ofInstant(parsed.get, ZoneOffset.UTC)
        assert(back.getMonthValue == a && back.getDayOfMonth == b,
          s"$a/$b/$y parsed day-first")
    }
  }

  test("cell lattice: singleton types classify exactly") {
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { n =>
      assert(CellInference.classify(n.toString) == TinyType.TInteger)
    }
    forAll2(Gen.choose(-1e12, 1e12), Gen.choose(1, 9)) { (x: Double, dp: Int) =>
      val s = BigDecimal(x).setScale(dp,
        BigDecimal.RoundingMode.HALF_UP).toString
      val t = CellInference.classify(s)
      assert(t == TinyType.TDecimal || t == TinyType.TInteger, s"'$s' → $t")
    }
    assert(CellInference.classify("true") == TinyType.TBoolean)
    assert(CellInference.classify("false") == TinyType.TBoolean)
    assert(CellInference.classify("") == TinyType.TNull)
    forAll(Gen.alphaStr.suchThat(s =>
      s.nonEmpty && s != "true" && s != "false")) { s =>
      val t = CellInference.classify(s)
      assert(t == TinyType.TString || t == TinyType.TDate, s"'$s' → $t")
    }
  }

  test("floored % matches Math.floorMod for random operands (Spark-evaluated)") {
    import spark.implicits._
    val cases = (for {
      a <- Seq(-1000L, -7L, -1L, 0L, 1L, 7L, 999L)
      b <- Seq(-13L, -3L, -1L, 1L, 3L, 13L)
    } yield (a, b)) ++
      Seq.tabulate(50)(i => ((i * 2654435761L) % 100000 - 50000,
        ((i * 40503L) % 97) + 1))
    val df = cases.toDF("a", "b")
    val out = graft.transform.Transform.inline(df, "m=row.a % row.b")
      .select($"a", $"b", $"m").collect()
    out.foreach { r =>
      val (a, b, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(m == Math.floorMod(a, b), s"$a % $b = $m, want ${Math.floorMod(a, b)}")
    }
  }

  test("ShingleHash equals builtin composition on random ASCII text (Spark)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(120, Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf(".,-!?:;")))
      .map(_.mkString)
    val samples = Gen.listOfN(200, gen).sample.get
    val df = samples.toDF("text")
    val tokens = split(lower($"text"), "\\W+")
    val count = size(tokens) - 2
    val grams = transform(sequence(lit(0), greatest(count - 1, lit(0))),
      i => concat_ws(" ", slice(tokens, i + 1, lit(3))))
    val slow = array_sort(array_distinct(transform(grams, g => xxhash64(g))))
    val cmp = df.select(
      graft.functions.SketchExprs.shingleHashes($"text", 3).as("fast"),
      slow.as("slow"))
    assert(cmp.filter(!($"fast" <=> $"slow")).count() == 0)
  }
}
