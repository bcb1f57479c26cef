package graft.tools

import java.lang.{Double => JDouble, Long => JLong}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Pins Canon's normalization to CPython's, bit for bit: the pyG10 table
 * below is CPython 3.x `f"{v:.10g}"` output for the exact doubles given
 * as big-endian IEEE-754 hex (generated once with
 * `struct.pack('>d', v).hex()`), covering fixed/scientific boundary
 * (1e-4 vs 1e-5; 9999999999 vs 1e+10), trailing-zero stripping,
 * half-even rounding, negative zero, subnormals, and both double
 * extremes. If this spec is green, a Verify sidecar hash differing from
 * the driver's gate means the INPUT rows differ — not the recipe.
 */
class CanonSpec extends AnyFunSuite {

  private val pyG10Table: Seq[(String, String)] = Seq(
    "0000000000000000" -> "0",
    "8000000000000000" -> "-0",
    "3ff0000000000000" -> "1",
    "bff0000000000000" -> "-1",
    "3fe0000000000000" -> "0.5",
    "3ff8000000000000" -> "1.5",
    "4086b80000000000" -> "727",
    "3fb999999999999a" -> "0.1",
    "3fd5555555555555" -> "0.3333333333",
    "3fe5555555555555" -> "0.6666666667",
    "3ee4f8b588e368f1" -> "1e-05",
    "3ee9e40930267892" -> "1.23456789e-05",
    "4202a05f1ff80000" -> "9999999999",
    "4202a05f20000000" -> "1e+10",
    "42374876e7ff0000" -> "1e+11",
    "420bf08eb0000000" -> "1.5e+10",
    "4202a05f1ffc0000" -> "1e+10",
    "3f1a36e2eb1c432d" -> "0.0001",
    "3f1a36d1bd105b06" -> "9.9999e-05",
    "3ff3c0ca43db770a" -> "1.234567895",
    "4004000000000000" -> "2.5",
    "400921fb54442d11" -> "3.141592654",
    "54b249ad2594c37d" -> "1e+100",
    "d4b249ad2594c37d" -> "-1e+100",
    "7fefffffffffffff" -> "1.797693135e+308",
    "0000000000000001" -> "4.940656458e-324",
    "0010000000000000" -> "2.225073859e-308",
    "419d6f34547e6b75" -> "123456789.1",
    "3f202e85be111841" -> "0.000123456789",
    "41d26580b487e6b4" -> "1234567890",
    "4206fee0e1a9e042" -> "1.23456789e+10",
    "3feffffffff920c7" -> "0.9999999999",
    "3feffffffff920c8" -> "0.9999999999",
    "41cdcd6500000000" -> "1000000000",
    "405ec00000000000" -> "123",
    "c05edd2f1a9fbe77" -> "-123.456",
    "44dfe185ca57c517" -> "6.02214076e+23",
    "3fc2492492492492" -> "0.1428571429",
    "4009249249249249" -> "3.142857143",
    "3ddb7cdfd9d7bdbb" -> "1e-10",
    "43e0000000000000" -> "9.223372037e+18",
    "430c6bf526340000" -> "1e+15",
    "42dc12218377de6b" -> "1.23456789e+14")

  test("pyG10 matches CPython %.10g on the pinned table") {
    pyG10Table.foreach { case (hex, expected) =>
      val v = JDouble.longBitsToDouble(JLong.parseUnsignedLong(hex, 16))
      assert(Canon.pyG10(v) == expected, s"for bits $hex (= $v)")
    }
  }

  test("pyG10 specials") {
    assert(Canon.pyG10(Double.PositiveInfinity) == "inf")
    assert(Canon.pyG10(Double.NegativeInfinity) == "-inf")
    assert(Canon.normCell(DoubleType, Double.NaN) == "NaN")
  }

  test("pyTimestamp matches str(datetime) incl. microsecond suppression") {
    def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))
    assert(Canon.pyTimestamp(ts("2024-01-28T00:00:00")) == "2024-01-28 00:00:00")
    assert(Canon.pyTimestamp(ts("2024-01-28T12:34:56.789")) ==
      "2024-01-28 12:34:56.789000")
    assert(Canon.pyTimestamp(ts("2024-01-28T12:34:56.000700")) ==
      "2024-01-28 12:34:56.000700")
  }

  test("TIMESTAMP_NTZ cells render Python-style, not ISO LocalDateTime") {
    val ldt = java.time.LocalDateTime.parse("1995-01-02T00:00:00")
    assert(Canon.normCell(TimestampNTZType, ldt) == "1995-01-02 00:00:00")
    assert(Canon.normCell(TimestampNTZType,
      java.time.LocalDateTime.parse("1995-01-02T12:34:56.000789")) ==
      "1995-01-02 12:34:56.000789")
  }

  test("normCell bool renders Python-style") {
    assert(Canon.normCell(BooleanType, true) == "True")
    assert(Canon.normCell(BooleanType, false) == "False")
    assert(Canon.normCell(BooleanType, null) == null)
  }

  test("canonicalize sorts columns by name and rows with nulls last") {
    val spark = SparkSpec.session
    val schema = StructType(Seq(
      StructField("b_val", StringType), StructField("a_key", LongType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("x", 2L), Row(null, 1L), Row("a", 1L), Row("x", 1L)),
      schema)
    val (cols, rows) = Canon.canonicalize(df)
    assert(cols == Seq("a_key", "b_val"))
    // key is (a_key asc as string, b_val with null AFTER values)
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq("1", "a"), Seq("1", "x"), Seq("1", null), Seq("2", "x")))
  }

  test("md5 is injective on separator-bearing cells") {
    val a = Array(Array("xy", "z"))
    val b = Array(Array("x", "yz"))
    assert(Canon.md5Hex(Seq("c1", "c2"), a) != Canon.md5Hex(Seq("c1", "c2"), b))
  }
}
