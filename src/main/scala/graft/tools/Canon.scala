package graft.tools

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.security.MessageDigest
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Canonical row normalization for the correctness gate — the EXACT
 * recipe documented in `scripts/local_verify.py:20-34`, re-expressed in
 * Scala so `graft.Verify` can emit a per-query sidecar hash next to each
 * parquet dump. When the driver's gate reports a hash mismatch that
 * replays value-identical (the q197/q254 class: rows+schema match, hash
 * doesn't), the sidecar plus [[HashCheck]] names the first differing
 * canonical row instead of leaving both sides guessing.
 *
 * Recipe (mirrors the Python):
 *   - columns sorted by name (code-point order);
 *   - each cell → Option[String]: null → None; NaN → "NaN"; floating
 *     point → Python `f"{v:.10g}"` (see [[pyG10]], parity-pinned in
 *     CanonSpec against CPython output); booleans → "True"/"False"
 *     (Python `str(bool)`); timestamps → Python `str(datetime)` at UTC
 *     ("YYYY-MM-DD HH:MM:SS[.ffffff]", fraction omitted when zero);
 *     everything else → toString;
 *   - rows sorted by the elementwise key (isNull, valueOr"") — i.e.
 *     null sorts after any value, values compare by code point.
 *
 * The md5 is over rows joined by '\n', cells by unit-separator U+001F,
 * null encoded as a lone U+0000, with backslash, newline, U+001F, U+0000
 * inside values backslash-escaped so the serialization is injective.
 */
object Canon {

  /** Python `f"{v:.10g}"` parity: 10 significant digits, half-even
    * rounding of the exact binary value, fixed notation for decimal
    * exponent in [-4, 10), otherwise scientific with the shortest
    * mantissa and a signed two-or-more-digit exponent. */
  def pyG10(v: Double): String = {
    if (v.isNaN) "nan"
    else if (v.isPosInfinity) "inf"
    else if (v.isNegInfinity) "-inf"
    else if (v == 0.0) { if (1.0 / v < 0) "-0" else "0" }
    else {
      val neg = v < 0
      val bd = new JBigDecimal(math.abs(v))
        .round(new MathContext(10, RoundingMode.HALF_EVEN))
        .stripTrailingZeros()
      val exp = bd.precision - bd.scale - 1
      val s =
        if (exp >= -4 && exp < 10) bd.toPlainString
        else {
          val digits = bd.unscaledValue.toString
          val mant =
            if (digits.length == 1) digits
            else s"${digits.head}.${digits.tail}"
          val es = if (exp < 0) f"-${-exp}%02d" else f"+$exp%02d"
          s"${mant}e$es"
        }
      if (neg) "-" + s else s
    }
  }

  private val tsSecs = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Python `str(datetime.datetime)`: microseconds only when nonzero. */
  def pyTimestamp(ts: java.sql.Timestamp): String = {
    val base = tsSecs.format(ts.toInstant)
    val micros = ts.getNanos / 1000
    if (micros == 0) base else f"$base.$micros%06d"
  }

  /** TIMESTAMP_NTZ cells surface as java.time.LocalDateTime, whose
    * toString is ISO ("1995-01-02T00:00") — render Python-style
    * instead (the fixture's raw date columns are NTZ; event-derived
    * outputs are normalized to TIMESTAMP by Tables.loadEvents). */
  def pyLocalDateTime(ldt: java.time.LocalDateTime): String = {
    val base = ldt.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss"))
    val micros = ldt.getNano / 1000
    if (micros == 0) base else f"$base.$micros%06d"
  }

  def normCell(dt: DataType, v: Any): String = {
    if (v == null) return null
    dt match {
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) "NaN" else pyG10(d)
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN) "NaN" else pyG10(f.toDouble)
      case BooleanType => if (v.asInstanceOf[Boolean]) "True" else "False"
      case TimestampType => pyTimestamp(v.asInstanceOf[java.sql.Timestamp])
      case TimestampNTZType =>
        pyLocalDateTime(v.asInstanceOf[java.time.LocalDateTime])
      // Complex/binary cells have no pinned cross-language rendering:
      // Scala would print WrappedArray(..)/[B@hash where the Python
      // recompute (scripts/check_sidecars.py) prints [1, 2]/bytes —
      // a sidecar that can never match, and for binary a JVM-identity
      // hash that is nondeterministic across runs. No current query
      // dump carries such a column (all 260 are scalar-typed); fail
      // loudly at dump time rather than shipping a poisoned sidecar.
      case _: ArrayType | _: StructType | _: MapType | BinaryType =>
        throw new IllegalArgumentException(
          s"Canon sidecar: unsupported cell type $dt — add an explicit " +
            "cross-language rendering (Canon.normCell + " +
            "scripts/check_sidecars.py) before dumping this column")
      case _ => v.toString
    }
  }

  /** Code-point string comparison (Python's `str <` semantics; differs
    * from String.compareTo only beyond the BMP). */
  def cmpCodePoints(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def cmpCells(a: String, b: String): Int = {
    val na = a == null; val nb = b == null
    if (na != nb) { if (na) 1 else -1 } // null sorts after any value
    else if (na) 0
    else cmpCodePoints(a, b)
  }

  private val rowOrdering: Ordering[Array[String]] =
    (x: Array[String], y: Array[String]) => {
      var i = 0
      val n = math.min(x.length, y.length)
      var c = 0
      while (c == 0 && i < n) { c = cmpCells(x(i), y(i)); i += 1 }
      if (c != 0) c else Integer.compare(x.length, y.length)
    }

  /** Canonicalize: (sorted column names, canonically sorted rows of
    * normalized cells; null cells are Scala nulls). Collects — callers
    * are gate-sized results only. */
  def canonicalize(df: DataFrame): (Seq[String], Array[Array[String]]) = {
    val fields = df.schema.fields
    val order = fields.indices.sortBy(i => fields(i).name)(
      Ordering.comparatorToOrdering(
        (a: String, b: String) => cmpCodePoints(a, b)))
    val cols = order.map(i => fields(i).name)
    val rows = df.collect().map { r =>
      order.map(i => normCell(fields(i).dataType, r.get(i))).toArray
    }
    java.util.Arrays.sort(rows, rowOrdering)
    (cols, rows)
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\u001f' => sb.append("\\u001f")
      case '\u0000' => sb.append("\\0")
      case c => sb.append(c)
    }
    sb.toString
  }

  def serializeRow(row: Array[String]): String =
    row.map(c => if (c == null) "\u0000" else esc(c)).mkString("\u001f")

  def md5Hex(cols: Seq[String], rows: Array[Array[String]]): String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(cols.mkString("\u001f").getBytes("UTF-8"))
    md.update('\n'.toByte)
    rows.foreach { r =>
      md.update(serializeRow(r).getBytes("UTF-8"))
      md.update('\n'.toByte)
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The sidecar payload written as `<out>/<name>.hash`. */
  def sidecar(df: DataFrame): String = {
    val (cols, rows) = canonicalize(df)
    s"md5=${md5Hex(cols, rows)}\nrows=${rows.length}\ncols=${cols.mkString(",")}\n"
  }
}
