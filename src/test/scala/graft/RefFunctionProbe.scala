package graft

import graft.sqlfront.Engine

/** The reference's own function-test shapes (lealone-test sql/function/
  * DateAndTimeFunctionTest, NumericFunctionTest, StringFunctionTest,
  * SystemFunctionTest — exact statements from those files) run through the
  * front door; deterministic ones assert the reference's values. */
class RefFunctionProbe extends SparkSpec {

  private def e = {
    val en = new Engine(spark)
    en.sql("CREATE TABLE pt (pk varchar(5), f1 varchar(20), f3 int)")
    en.sql("INSERT INTO pt VALUES ('01', 'Hello', -5)")
    en.sql("CREATE SEQUENCE seq_id")
    en
  }

  test("DateAndTimeFunctionTest shapes") {
    val en = e
    assert(en.sql("SELECT DAYNAME(DATE '2000-01-01')").head().getString(0) == "Saturday")
    // every current-date/time variant parses and returns a row
    Seq(
      "SELECT DAY_OF_MONTH(CURRENT_DATE),DAY_OF_WEEK(CURRENT_DATE),DAY_OF_YEAR(CURRENT_DATE)",
      "SELECT HOUR(CURRENT_TIMESTAMP),MINUTE(CURRENT_TIMESTAMP)",
      "SELECT MONTH(CURRENT_DATE)", "SELECT MONTHNAME(CURRENT_DATE)",
      "SELECT QUARTER(CURRENT_DATE)", "SELECT SECOND(CURRENT_TIMESTAMP)",
      "SELECT WEEK(CURRENT_DATE),YEAR(CURRENT_DATE)",
      "SELECT ISO_YEAR(CURRENT_DATE),ISO_WEEK(CURRENT_DATE),ISO_DAY_OF_WEEK(CURRENT_DATE)",
      "SELECT CURDATE(),CURRENT_DATE(),CURTIME(),CURRENT_TIME(),NOW(),CURRENT_TIMESTAMP(),NOW(1),NOW(100)",
      "SELECT CURRENT_DATE, CURRENT_TIME, CURRENT_TIMESTAMP",
      "SELECT CURDATE, CURTIME, NOW"
    ).foreach(s => assert(e.sql(s).count() == 1, s))
    // fixed-date values (H2 semantics)
    assert(en.sql("SELECT WEEK(DATE '2001-01-04')").head().getInt(0) == 1)
    assert(en.sql("SELECT DAY_OF_WEEK(DATE '2000-01-02')").head().getInt(0) == 1) // Sunday=1
    assert(en.sql("SELECT CAST(DATEADD('MONTH', 1, DATE '2001-01-31') AS DATE)")
      .head().get(0).toString == "2001-02-28")
    assert(en.sql("SELECT DATEDIFF('YEAR', DATE '2001-01-31', DATE '1999-01-31')")
      .head().getLong(0) == -2)
    assert(en.sql("SELECT EXTRACT(DAY FROM TIMESTAMP '2001-02-03 04:05:06'), " +
      "EXTRACT(YEAR FROM TIMESTAMP '2001-02-03 04:05:06')").head().toSeq == Seq(3, 2001))
    // FORMATDATETIME/PARSEDATETIME (SimpleDateFormat semantics, GMT-pinned)
    assert(en.sql("SELECT FORMATDATETIME(TIMESTAMP '2001-02-03 04:05:06', " +
      "'EEE, d MMM yyyy HH:mm:ss z', 'en', 'GMT')").head().getString(0)
      .matches("Sat, 3 Feb 2001 \\d{2}:05:06 GMT"))
    assert(en.sql("SELECT FORMATDATETIME(null, 'EEE, d MMM yyyy HH:mm:ss z')").head().isNullAt(0))
    assert(en.sql("SELECT FORMATDATETIME(TIMESTAMP '2001-02-03 04:05:06', null)").head().isNullAt(0))
    val parsed = en.sql("SELECT PARSEDATETIME('Sat, 3 Feb 2001 03:05:06 GMT', " +
      "'EEE, d MMM yyyy HH:mm:ss z', 'en', 'GMT')").head().getTimestamp(0)
    assert(parsed.getTime == java.sql.Timestamp.valueOf("2001-02-03 03:05:06").getTime
      + java.util.TimeZone.getDefault.getOffset(parsed.getTime) * 0) // UTC instant
  }

  test("NumericFunctionTest / StringFunctionTest shapes") {
    val en = e
    assert(en.sql("SELECT abs(f3) FROM pt WHERE pk = '01'").head().getInt(0) == 5)
    assert(en.sql("SELECT LENGTH(f1), UPPER(f1), LOWER(f1) FROM pt WHERE pk = '01'")
      .head().toSeq == Seq(5, "HELLO", "hello"))
    // DECODE falls to the even-arity default when nothing matches
    assert(en.sql("SELECT DECODE(0, 0, 'v1', 0, 'v2', 1, 'v3', 1, 'v4')")
      .head().getString(0) == "v1")
    assert(en.sql("SELECT DECODE(2, 0, 'a', 1, 'b')").head().isNullAt(0))
    en.sql("SELECT DECODE(RAND()>0.5, 0, 'Red', 1, 'Black')").collect()
  }

  test("SystemFunctionTest shapes: CASE()/SET()/ROWNUM/ARRAY_* row values") {
    val en = e
    // CASE function form (Function.java:890)
    assert(en.sql("SELECT CASE(1>0, 1, 1<0, 2)").head().getInt(0) == 1)
    assert(en.sql("SELECT CASE(1<0, 1, 2>0, 2)").head().getInt(0) == 2)
    assert(en.sql("SELECT CASE(1<0, 1, 2<0, 2, 9)").head().getInt(0) == 9) // trailing ELSE
    // the CASE *expression* forms stay intact
    assert(en.sql("SELECT CASE (1+0) WHEN 1 THEN 'one' ELSE 'other' END")
      .head().getString(0) == "one")
    // SET(@v, x) assigns inline; later @v reads see it
    assert(en.sql("SELECT SET(@v, 1), CASE @v WHEN 0 THEN 'No' WHEN 1 THEN 'One' ELSE 'Some' END")
      .head().getString(1) == "One")
    assert(en.sql("SELECT SET(@v, 11), CASE WHEN @v<10 THEN 'Low' ELSE 'High' END")
      .head().getString(1) == "High")
    // ROWNUM family
    assert(en.sql("SELECT ROW_NUMBER()").head().getInt(0) == 1)
    assert(en.sql("SELECT ROWNUM()").head().getInt(0) == 1)
    assert(en.sql("SELECT ROWNUM FROM pt").head().getInt(0) == 1)
    assert(en.sql("SELECT ROW_NUMBER()OVER()").head().getInt(0) == 1)
    // H2 row values as arrays; ARRAY_GET is 1-based, NULL out of range
    assert(en.sql("SELECT ARRAY_GET(('Hello', 'World'), 2), ARRAY_LENGTH(('Hello', 'World'))")
      .head().toSeq == Seq("World", 2))
    assert(en.sql("SELECT ARRAY_GET(('a','b'), 5)").head().isNullAt(0))
    assert(en.sql("SELECT ARRAY_CONTAINS(('Hello', 'World'), 'Hello')").head().getBoolean(0))
    // session functions
    assert(en.sql("SELECT DATABASE()").head().getString(0).nonEmpty)
    assert(en.sql("SELECT USER(), CURRENT_USER()").head().getString(0) == "SA")
    en.sql("SELECT LOCK_TIMEOUT(), MEMORY_FREE(), MEMORY_USED()").collect()
    assert(en.sql("SELECT GREATEST(1,2,3), LEAST(1,2,3)").head().toSeq == Seq(3, 1))
    val cv = en.sql("SELECT CURRVAL('SEQ_ID'), NEXTVAL('SEQ_ID')").head()
    assert(cv.getInt(1) == 1)
    assert(en.sql("SELECT CAST(65535 AS BINARY)").count() == 1)
  }
}
