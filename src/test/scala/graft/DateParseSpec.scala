package graft

import java.time.LocalDate

import graft.functions.DateKernels
import graft.profile.Profiler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level contract for the native whitelist date parser
  * ([[graft.functions.DateKernels.parseWhitelist]]) — the semantics the
  * DuckDB oracle chain (`coalesce(try_strptime(c, fmt)...)`,
  * Queries.parseSql) must see bit-for-bit. Every expectation here was
  * cross-checked against DuckDB 1.x `try_strptime` directly. */
class DateParseSpec extends SparkSpec {
  import spark.implicits._

  private def p(s: String): Option[LocalDate] = {
    val r = DateKernels.parseWhitelist(UTF8String.fromString(s))
    if (r == DateKernels.NoDate) None else Some(LocalDate.ofEpochDay(r.toLong))
  }

  test("padded formats parse as in round 2") {
    assert(p("2024-01-02").contains(LocalDate.of(2024, 1, 2)))
    assert(p("31/12/2024").contains(LocalDate.of(2024, 12, 31)))
    assert(p("12/31/2024").contains(LocalDate.of(2024, 12, 31))) // M/d fallback
    assert(p("2024/01/02").contains(LocalDate.of(2024, 1, 2)))
    assert(p("01-02-2024").contains(LocalDate.of(2024, 2, 1))) // d-M-y
    assert(p("20240102").contains(LocalDate.of(2024, 1, 2)))
    assert(p("2024-01-02 23:59:59").contains(LocalDate.of(2024, 1, 2)))
  }

  test("non-padded fields parse (pandas/strptime/DuckDB parity)") {
    assert(p("1/2/2024").contains(LocalDate.of(2024, 2, 1))) // day-first
    assert(p("2024-1-2").contains(LocalDate.of(2024, 1, 2)))
    assert(p("2024/1/2").contains(LocalDate.of(2024, 1, 2)))
    assert(p("1-2-2024").contains(LocalDate.of(2024, 2, 1)))
    assert(p("2024-1-2 3:4:5").contains(LocalDate.of(2024, 1, 2)))
    // d/M preferred, M/d only when day-first is impossible
    assert(p("3/25/2024").contains(LocalDate.of(2024, 3, 25)))
  }

  test("calendar validation: leap years, days-in-month, field ranges") {
    assert(p("2024-02-29").contains(LocalDate.of(2024, 2, 29)))
    assert(p("2023-02-29").isEmpty)
    assert(p("2024-02-30").isEmpty)
    assert(p("2024-13-01").isEmpty)
    assert(p("2024-00-10").isEmpty)
    assert(p("2024-01-00").isEmpty)
    assert(p("2024-04-31").isEmpty)
    assert(p("1900-02-29").isEmpty) // century non-leap
    assert(p("2000-02-29").contains(LocalDate.of(2000, 2, 29)))
    assert(p("2024-01-02 24:00:00").isEmpty)
    assert(p("2024-01-02 23:60:00").isEmpty)
    assert(p("2024-01-02 23:00:60").isEmpty)
  }

  test("rejections: garbage, prefixes, wrong widths, trailing junk") {
    assert(p("garbage").isEmpty)
    assert(p("bad-2024-01-02").isEmpty) // leading non-digit
    assert(p("50").isEmpty) // the dateutil bare-integer bug we don't copy
    assert(p("12345678").isEmpty) // y=1234 m=56: invalid month
    assert(p("123/2/2024").isEmpty) // 3-digit day field
    assert(p("2024-01-2x").isEmpty)
    assert(p("2024-01-02 ").isEmpty) // no whitespace trimming (documented)
    assert(p("024-01-02").isEmpty) // 3-digit year (documented divergence)
    assert(p("").isEmpty)
  }

  test("epoch-day arithmetic matches java.time across eras") {
    for (s <- Seq("1582-10-20", "1899-12-30", "1970-01-01", "2100-03-01",
        "9999-12-31", "0001-01-01"))
      assert(p(s).contains(LocalDate.parse(s)), s)
  }

  test("expression face: codegen and interpreted paths agree, null-safe") {
    val df = Seq(Some("1/2/2024"), Some("2024-01-02"), Some("nope"), None)
      .toDF("s")
    val out = df.select(date_format(Profiler.lenientParseDate($"s"),
      "yyyy-MM-dd")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2024-02-01"), Some("2024-01-02"), None, None))
    // force the interpreted path too (expression eval, no codegen)
    val interp = df.filter(Profiler.lenientParseDate($"s").isNotNull).count()
    assert(interp == 2)
  }
}
