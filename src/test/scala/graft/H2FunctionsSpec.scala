package graft

import graft.functions.H2Functions._

class H2FunctionsSpec extends SparkSpec {

  test("soundex matches the classic algorithm") {
    assert(soundex("Robert") == "R163")
    assert(soundex("Rupert") == "R163")
    assert(soundex("Ashcraft") == "A261")
    assert(soundex("Tymczak") == "T522")
    assert(soundex("Pfister") == "P236")
    assert(soundex("") == null)
    assert(soundex(null) == null)
  }

  test("difference counts matching soundex positions") {
    assert(difference("Robert", "Rupert") == 4)
    assert(difference("Smith", "Smythe") == 4)
    assert(difference("Green", "Blue") <= 2)
    assert(difference(null, "x") == null)
  }

  test("rawtohex/hextoraw round-trip UTF-16 chars") {
    assert(rawToHex("Ab") == "00410062")
    assert(hexToRaw("00410062") == "Ab")
    val s = "héllo ≈ wörld"
    assert(hexToRaw(rawToHex(s)) == s)
  }

  test("insertStr splices 1-based") {
    assert(insertStr("abcdef", 2, 3, "XY") == "aXYef")
    assert(insertStr("abc", 1, 0, "Z") == "Zabc")
    assert(insertStr("abc", 10, 5, "Z") == "abcZ")
  }

  test("stringEncode/stringDecode round-trip") {
    val s = "line1\nline2\t\"quoted\" \\ unicode: é中"
    assert(stringDecode(stringEncode(s)) == s)
    assert(stringEncode("a\nb") == "a\\nb")
  }

  test("utf8 round-trip") {
    assert(utf8ToString(stringToUtf8("héllo")) == "héllo")
  }

  test("roundMagic shaves float noise") {
    assert(roundMagic(0.1 + 0.2) == 0.3)
    assert(roundMagic(1e-14) == 0.0)
    assert(roundMagic(1.23456789e13) == 1.23456789e13)
  }

  test("compress/expand round-trip") {
    val data = ("graft " * 100).getBytes("UTF-8")
    val c = compressDeflate(data)
    assert(c.length < data.length)
    assert(expandDeflate(c).toSeq == data.toSeq)
  }

  test("XTEA encrypt/decrypt round-trip") {
    val key = "0123456789abcdef".getBytes
    val data = "xtea block tests".getBytes // 16 bytes
    val enc = encrypt("XTEA", key, data)
    assert(enc.toSeq != data.toSeq)
    assert(decrypt("XTEA", key, enc).toSeq == data.toSeq)
    assert(decrypt("XTEA", key, encrypt("XTEA", key, "odd".getBytes)).take(3).toSeq
      == "odd".getBytes.toSeq)
  }

  test("LZF round-trip and actually compresses repetitive input") {
    val data = ("spark graft lzf " * 200).getBytes("UTF-8")
    val c = compressLzf(data)
    assert(c.length < data.length / 2)
    assert(expandLzf(c).toSeq == data.toSeq)
    // non-compressible input still round-trips
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(1000)(rnd.nextInt().toByte)
    assert(expandLzf(compressLzf(noise)).toSeq == noise.toSeq)
    assert(expandLzf(compressLzf(Array.empty[Byte])).isEmpty)
    assert(expandLzf(compressLzf("ab".getBytes)).toSeq == "ab".getBytes.toSeq)
  }

  test("hash is iterated SHA-256") {
    val h1 = hashFn("SHA256", "abc".getBytes, 1)
    assert(h1.length == 32)
    val h2 = hashFn("SHA256", "abc".getBytes, 2)
    assert(h2.toSeq == java.security.MessageDigest.getInstance("SHA-256").digest(h1).toSeq)
  }

  test("dateAdd/dateDiff with H2 unit strings") {
    val ts = java.sql.Timestamp.valueOf("2020-01-31 10:30:00")
    assert(dateAdd("MONTH", 1, ts) == java.sql.Timestamp.valueOf("2020-02-29 10:30:00"))
    assert(dateAdd("DD", 1, ts) == java.sql.Timestamp.valueOf("2020-02-01 10:30:00"))
    assert(dateAdd("QUARTER", 2, ts) == java.sql.Timestamp.valueOf("2020-07-31 10:30:00"))
    val a = java.sql.Timestamp.valueOf("2019-12-31 23:59:59")
    val b = java.sql.Timestamp.valueOf("2020-01-01 00:00:01")
    assert(dateDiff("DAY", a, b) == 1L)     // crossed one day boundary
    assert(dateDiff("YEAR", a, b) == 1L)
    assert(dateDiff("SECOND", a, b) == 2L)
    assert(dateDiff("MONTH", a, b) == 1L)
  }

  test("iso fields") {
    val d = java.sql.Date.valueOf("2021-01-01") // ISO week 53 of 2020
    assert(isoYear(d) == 2020)
    assert(isoWeek(d) == 53)
    assert(isoDayOfWeek(d) == 5) // Friday
    assert(dayName(d) == "Friday")
    assert(monthName(d) == "January")
  }

  test("xml constructors") {
    assert(xmlAttr("a", "x<y") == " a=\"x&lt;y\"")
    assert(xmlNode("t", null, "c") == "<t>c</t>")
    assert(xmlNode("t", " a=\"1\"", null) == "<t a=\"1\"/>")
    assert(xmlCdata("x") == "<![CDATA[x]]>")
  }

  test("encrypt/decrypt round-trip (AES)") {
    val key = "0123456789abcdef".getBytes
    val data = "secret payload!!".getBytes // 16 bytes
    val enc = encrypt("AES", key, data)
    assert(enc.toSeq != data.toSeq)
    assert(decrypt("AES", key, enc).toSeq == data.toSeq)
    // non-multiple-of-16 zero-pads
    val enc2 = encrypt("AES", key, "abc".getBytes)
    assert(decrypt("AES", key, enc2).take(3).toSeq == "abc".getBytes.toSeq)
  }

  test("DECODE: first match wins, null-safe, default") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a"), ("b"), ("z"), (null: String)).toDF("x")
    val out = df.select(decodeH2($"x",
        Seq(lit("a") -> lit(1), lit("b") -> lit(2), lit(null).cast("string") -> lit(99)),
        default = Some(lit(-1))).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, -1, 99))
  }

  test("functions are SQL-registered") {
    val r = spark.sql(
      """SELECT soundex_h2('Robert') AS s, difference('Robert','Rupert') AS d,
         rawtohex('A') AS h, roundmagic(0.1 + 0.2) AS rm, zero() AS z""").head()
    assert(r.getString(0) == "R163")
    assert(r.getInt(1) == 4)
    assert(r.getString(2) == "0041")
    assert(r.getDouble(3) == 0.3)
    assert(r.getInt(4) == 0)
  }
}
