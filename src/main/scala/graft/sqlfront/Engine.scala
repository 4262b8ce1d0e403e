package graft.sqlfront

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dml

/** H2-dialect SQL front door (SURVEY §4.3 "thin SQL front-door translator"
  * + §7 modules catalog/ and sqlfront/).
  *
  * The reference parses its dialect with a 5k-line recursive-descent parser
  * (lealone-sql Parser.java); Spark already has a full SQL parser, so this
  * layer only (a) keeps a mutable catalog of named DataFrames (the
  * Database→Schema→Table registry, Schema.java), (b) executes DDL/DML as
  * copy-on-write snapshot rewrites via [[graft.operators.Dml]], and
  * (c) rewrites the H2-only surface into Spark SQL before delegating to
  * `spark.sql`:
  *   - `FROM t SELECT …` FROM-first form (Parser.java:1397)
  *   - `SYSTEM_RANGE(a,b[,step])` (RangeTable.java)
  *   - `CSVREAD('file')` in FROM position (Function.java:352, Csv.java:46)
  *   - `ORDER BY =n` ordinal form (Parser.java:1493)
  *   - `SAMPLE_SIZE n` head-sample (Select.java:877 — head semantics, not
  *     random, matching the reference)
  *   - `MERGE INTO t [KEY(cols)] VALUES/SELECT` (Merge.java:35,146)
  *   - `UPDATE … LIMIT n` / `DELETE … LIMIT n` (Update.java:140-150)
  *   - sequences: CREATE SEQUENCE / NEXTVAL / CURRVAL (SequenceValue.java)
  *     — driver-side counters, documented as non-parallel id generation;
  *     at scale use monotonically_increasing_id instead.
  *
  * Tables live as temp views so translated SQL sees them; every mutation
  * re-registers the view (snapshot semantics — readers of the old DataFrame
  * keep their snapshot, exactly like the reference's MVCC read view).
  */
final class Engine(val spark: SparkSession) {

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  private val primaryKeys = mutable.HashMap.empty[String, Seq[String]]
  private val identityCols = mutable.HashMap.empty[String, String]
  private val identityNext = mutable.HashMap.empty[String, Long]
  private val sequences = mutable.HashMap.empty[String, Sequence]
  private var rangeViewId = 0

  private final class Sequence(var next: Long, val inc: Long) {
    var curr: Long = next - inc
    def nextVal(): Long = { curr = next; next += inc; curr }
  }

  graft.functions.H2Functions.registerAll(spark)
  graft.functions.Aggregators.registerAll(spark)

  def register(name: String, df: DataFrame): Unit = {
    tables(name.toLowerCase) = df
    df.createOrReplaceTempView(name.toLowerCase)
  }

  def table(name: String): DataFrame = tables(name.toLowerCase)
  def tableNames: Seq[String] = tables.keys.toSeq
  def mode: String = compatibilityMode

  /** Execute one or more ';'-separated statements; returns the DataFrame of
    * the last query (or an empty status frame for DDL/DML). */
  def sql(text: String): DataFrame =
    splitStatements(text).map(execOne).lastOption
      .getOrElse(spark.emptyDataFrame)

  // ------------------------------------------------------------------
  private def splitStatements(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    text.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case ';' if !inStr => if (sb.toString.trim.nonEmpty) out += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString
    out.toSeq
  }

  private val createTableRe =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*$""".r
  private val createTableAsRe =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(.*)$""".r
  private val dropTableRe =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val truncateRe = """(?is)^\s*TRUNCATE\s+TABLE\s+(\w+)\s*$""".r
  private val createSeqRe =
    """(?is)^\s*CREATE\s+SEQUENCE\s+(\w+)(?:\s+START\s+WITH\s+(-?\d+))?(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*$""".r
  private val insertValuesRe =
    """(?is)^\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\)\s*)?(?:DIRECT\s+)?VALUES\s*(.*)$""".r
  private val insertSelectRe =
    """(?is)^\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\)\s*)?(SELECT\s+.*|FROM\s+.*)$""".r
  private val updateRe =
    """(?is)^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*$""".r
  private val deleteRe =
    """(?is)^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*$""".r
  private val mergeRe =
    """(?is)^\s*MERGE\s+INTO\s+(\w+)\s*(?:\(([^)]*)\)\s*)?(?:KEY\s*\(([^)]*)\)\s*)?(VALUES\s*.*|SELECT\s+.*|FROM\s+.*)$""".r

  private val createViewRe =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*)$""".r
  private val explainRe = """(?is)^\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?(.*)$""".r
  private val setVarRe = """(?is)^\s*SET\s+@(\w+)\s*=\s*(.*)$""".r
  private val scriptRe = """(?is)^\s*SCRIPT\s*$""".r
  private val runScriptRe = """(?is)^\s*RUNSCRIPT\s+FROM\s+'([^']+)'\s*$""".r
  private val prepareRe =
    """(?is)^\s*PREPARE\s+(\w+)\s+AS\s+(.*)$""".r
  private val executeRe = """(?is)^\s*EXECUTE\s+(\w+)\s*(?:\((.*)\))?\s*$""".r
  private val deallocateRe = """(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?(\w+)\s*$""".r
  private val setModeRe = """(?is)^\s*SET\s+MODE\s+(\w+)\s*$""".r
  private val variables = mutable.HashMap.empty[String, String]
  private val procedures = mutable.HashMap.empty[String, String]
  private var compatibilityMode: String = "REGULAR"

  private def execOne(stmt0: String): DataFrame = {
    val stmt = stmt0.trim
    stmt match {
      case explainRe(q) =>
        // EXPLAIN [PLAN FOR] … (dml/Explain.java:30, Select.getPlanSQL)
        import spark.implicits._
        val df = runSelect(q)
        Seq(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)).toDF("plan")
      case setVarRe(name, value) =>
        // SET @v = expr (Variable.java:20); substituted at plan time
        variables(name.toLowerCase) =
          spark.sql(s"SELECT ${substSequences(value)}").head().get(0) match {
            case s: String => s"'${s.replace("'", "''")}'"
            case v => String.valueOf(v)
          }
        status()
      case scriptRe() =>
        // SCRIPT (dml/Script.java): DDL re-emission as a result set
        import spark.implicits._
        script().toDF("script")
      case runScriptRe(path) =>
        // RUNSCRIPT FROM 'file' (dml/RunScript.java)
        sql(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
      case setModeRe(mode) =>
        // compatibility modes MySQL/PostgreSQL/… (db/Mode.java:17): recorded;
        // coercion differences are handled by ANSI-off session conf
        compatibilityMode = mode.toUpperCase; status()
      case prepareRe(name, body) =>
        // PREPARE/EXECUTE/DEALLOCATE procedures (ddl/PrepareProcedure.java,
        // dml/ExecuteProcedure.java): named parameterized saved queries;
        // `?` placeholders substitute positionally at EXECUTE.
        procedures(name.toLowerCase) = body; status()
      case executeRe(name, args) =>
        val body0 = procedures.getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"no prepared statement $name"))
        var body = body0
        Option(args).toSeq.flatMap(splitTop(_)).map(_.trim).foreach { a =>
          body = body.replaceFirst("\\?",
            java.util.regex.Matcher.quoteReplacement(a))
        }
        execOne(body)
      case deallocateRe(name) =>
        procedures.remove(name.toLowerCase); status()
      case createViewRe(name, query) =>
        register(name, runSelect(query)); status()
      case createTableAsRe(name, query) =>
        register(name, runSelect(query)); status()
      case createTableRe(name, colDefs) =>
        val (schema, pks) = parseColumnDefs(colDefs)
        if (pks.nonEmpty) primaryKeys(name.toLowerCase) = pks
        // IDENTITY / AUTO_INCREMENT column (Column.java auto-increment +
        // backing Sequence, Sequence.java:25): engine-assigned ids
        splitTop(colDefs).map(_.trim).foreach { d =>
          val up = d.toUpperCase
          if (up.contains("IDENTITY") || up.contains("AUTO_INCREMENT")) {
            identityCols(name.toLowerCase) = d.split("\\s+")(0).toLowerCase
            identityNext(name.toLowerCase) = 1L
          }
        }
        register(name, spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
        status()
      case dropTableRe(name) =>
        tables.remove(name.toLowerCase)
        spark.catalog.dropTempView(name.toLowerCase); status()
      case truncateRe(name) =>
        register(name, Dml.truncate(table(name))); status()
      case createSeqRe(name, start, inc) =>
        sequences(name.toLowerCase) = new Sequence(
          Option(start).map(_.toLong).getOrElse(1L),
          Option(inc).map(_.toLong).getOrElse(1L))
        status()
      case insertValuesRe(name, cols, tuples) =>
        doInsert(name, Option(cols), parseValueRows(name, tuples)); status()
      case insertSelectRe(name, cols, query) =>
        doInsert(name, Option(cols), runSelect(query)); status()
      case mergeRe(name, cols, keys, source) =>
        val src = source.trim match {
          case v if v.toUpperCase.startsWith("VALUES") =>
            parseValueRows(name, v.substring(6))
          case q => runSelect(q)
        }
        val t = table(name)
        val aligned = alignTo(t, Option(cols).map(splitTop(_).map(_.trim)), src)
        val key = Option(keys).map(_.split(",").map(_.trim.toLowerCase).toSeq)
          .orElse(primaryKeys.get(name.toLowerCase))
          .getOrElse(Seq(t.columns.head))
        register(name, Dml.mergeInto(t, aligned, key)); status()
      case updateRe(name, sets, where, limit) =>
        val t = table(name)
        val cond0 = Option(where).map(w => expr(substSequences(w))).getOrElse(lit(true))
        val setMap = splitTop(sets).map { s =>
          val Array(c, v) = s.split("=", 2)
          c.trim -> expr(substSequences(v.trim))
        }.toMap
        val out = Option(limit) match {
          case None => Dml.update(t, cond0, setMap)
          case Some(n) => // H2 UPDATE..LIMIT: first n matching rows
            val rid = t.withColumn("__rid", monotonically_increasing_id())
            val victims = rid.filter(cond0).orderBy(col("__rid")).limit(n.toInt)
              .select(col("__rid").as("__vic"))
            Dml.update(rid.join(victims, col("__rid") === col("__vic"), "left"),
                col("__vic").isNotNull, setMap)
              .drop("__rid", "__vic")
        }
        register(name, out); status()
      case deleteRe(name, where, limit) =>
        val t = table(name)
        val cond0 = Option(where).map(w => expr(substSequences(w))).getOrElse(lit(true))
        val out = Option(limit) match {
          case None => Dml.delete(t, cond0)
          case Some(n) =>
            val rid = t.withColumn("__rid", monotonically_increasing_id())
            val victims = rid.filter(cond0).orderBy(col("__rid")).limit(n.toInt)
              .select(col("__rid").as("__vic"))
            rid.join(victims, col("__rid") === col("__vic"), "left_anti")
              .drop("__rid")
        }
        register(name, out); status()
      case _ => runSelect(stmt)
    }
  }

  private def status(): DataFrame = {
    import spark.implicits._
    Seq("OK").toDF("status")
  }

  // ---- SELECT translation ----

  private[sqlfront] def translate(q0: String): String = {
    var q = q0.trim
    // FROM-first: FROM <from...> SELECT <rest>  (Parser.java:1397)
    if (q.toUpperCase.startsWith("FROM")) {
      val selIdx = topLevelIndexOf(q, "SELECT")
      if (selIdx > 0) {
        val fromPart = q.substring(4, selIdx).trim
        val rest = q.substring(selIdx + 6).trim
        // WHERE/GROUP/ORDER/... belong after the re-inserted FROM
        val tailIdx = earliestTopLevel(rest,
          Seq("WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "OFFSET"))
        q = if (tailIdx < 0) s"SELECT $rest FROM $fromPart"
        else s"SELECT ${rest.substring(0, tailIdx)} FROM $fromPart ${rest.substring(tailIdx)}"
      }
    }
    // SYSTEM_RANGE(a,b[,s]) → registered range view
    val sysRange = """(?i)SYSTEM_RANGE\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*(?:,\s*(-?\d+)\s*)?\)""".r
    q = sysRange.replaceAllIn(q, m => {
      val (a, b) = (m.group(1).toLong, m.group(2).toLong)
      val step = Option(m.group(3)).map(_.toLong).getOrElse(1L)
      rangeViewId += 1
      val v = s"graft_system_range_$rangeViewId"
      spark.range(a, b + (if (step > 0) 1 else -1), step).toDF("x")
        .createOrReplaceTempView(v)
      v
    })
    // CSVREAD('path') → registered csv view
    val csvRead = """(?i)CSVREAD\s*\(\s*'([^']+)'\s*\)""".r
    q = csvRead.replaceAllIn(q, m => {
      rangeViewId += 1
      val v = s"graft_csvread_$rangeViewId"
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(m.group(1)).createOrReplaceTempView(v)
      v
    })
    // ORDER BY =n → ORDER BY n (Parser.java:1493)
    q = q.replaceAll("""(?i)(ORDER\s+BY\s+)=\s*(\d+)""", "$1$2")
    // H2/MSSQL `SELECT TOP n …` → LIMIT n appended
    val topRe = """(?is)^(\s*SELECT\s+)TOP\s+(\d+)\s+(.*)$""".r
    q = q match {
      case topRe(sel, n, rest) => s"$sel$rest LIMIT $n"
      case other => other
    }
    // MySQL `LIMIT offset, count` → LIMIT count OFFSET offset
    q = q.replaceAll("""(?i)\bLIMIT\s+(\d+)\s*,\s*(\d+)""", "LIMIT $2 OFFSET $1")
    // INFORMATION_SCHEMA.X → synthesized meta view (MetaTable.java:68)
    val infoRe = """(?i)INFORMATION_SCHEMA\.(\w+)""".r
    q = infoRe.replaceAllIn(q, m => metaView(m.group(1).toLowerCase))
    // @var substitution (Variable.java:20)
    val varRe = """@(\w+)""".r
    q = varRe.replaceAllIn(q, m =>
      java.util.regex.Matcher.quoteReplacement(
        variables.getOrElse(m.group(1).toLowerCase, "NULL")))
    // SAMPLE_SIZE n → LIMIT n (head-sample semantics, Select.java:877)
    q = q.replaceAll("""(?i)\bSAMPLE_SIZE\s+(\d+)""", "LIMIT $1")
    // NEXTVAL/CURRVAL
    substSequences(q)
  }

  private def runSelect(q: String): DataFrame = spark.sql(translate(q))

  private def substSequences(q0: String): String = {
    var q = q0
    val nv = """(?i)NEXTVAL\s*\(\s*'(\w+)'\s*\)""".r
    while (nv.findFirstIn(q).isDefined) {
      q = nv.replaceFirstIn(q, {
        val m = nv.findFirstMatchIn(q).get
        sequences(m.group(1).toLowerCase).nextVal().toString
      })
    }
    val cv = """(?i)CURRVAL\s*\(\s*'(\w+)'\s*\)""".r
    cv.replaceAllIn(q, m => sequences(m.group(1).toLowerCase).curr.toString)
  }

  /** INFORMATION_SCHEMA synthesis (MetaTable.java:68 — ids :77-107): the
    * meta tables meaningful for a batch engine, generated from the live
    * catalog. Registered lazily per reference. */
  private def metaView(name: String): String = {
    import spark.implicits._
    val view = s"graft_info_$name"
    val df = name match {
      case "tables" =>
        tables.keys.toSeq.map(t => ("graft", "public", t, "TABLE", "PARQUET"))
          .toDF("table_catalog", "table_schema", "table_name", "table_type",
            "storage_type")
      case "columns" =>
        tables.toSeq.flatMap { case (t, df0) =>
          df0.schema.fields.zipWithIndex.map { case (f, i) =>
            (t, f.name, i + 1, f.dataType.catalogString.toUpperCase,
              if (f.nullable) "YES" else "NO")
          }
        }.toDF("table_name", "column_name", "ordinal_position", "data_type",
          "is_nullable")
      case "sequences" =>
        sequences.toSeq.map { case (n, s) => (n, s.curr, s.inc) }
          .toDF("sequence_name", "current_value", "increment")
      case "settings" =>
        spark.conf.getAll.toSeq.sortBy(_._1).map { case (k, v) => (k, v) }
          .toDF("setting_name", "setting_value")
      case "constraints" =>
        primaryKeys.toSeq.map { case (t, ks) =>
          (t, "PRIMARY KEY", ks.mkString(",")) }
          .toDF("table_name", "constraint_type", "column_list")
      case other => throw new IllegalArgumentException(
        s"INFORMATION_SCHEMA.$other not supported")
    }
    df.createOrReplaceTempView(view)
    view
  }

  /** SCRIPT-style DDL dump (dml/Script.java): re-emittable CREATE TABLE +
    * sequence statements for the current catalog. Data itself snapshots to
    * parquet via `backup`. */
  def script(): Seq[String] = {
    val ddl = tables.toSeq.map { case (name, df) =>
      val cols = df.schema.fields.map { f =>
        val pk = primaryKeys.get(name).exists(_.contains(f.name.toLowerCase))
        s"${f.name} ${f.dataType.sql}${if (pk) " PRIMARY KEY" else ""}"
      }
      s"CREATE TABLE $name (${cols.mkString(", ")});"
    }
    val seqs = sequences.toSeq.map { case (n, s) =>
      s"CREATE SEQUENCE $n START WITH ${s.next} INCREMENT BY ${s.inc};"
    }
    ddl ++ seqs
  }

  /** BACKUP-style snapshot (dml/Backup.java): every table to parquet. */
  def backup(dir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }

  // ---- helpers ----

  private def parseColumnDefs(defs: String): (StructType, Seq[String]) = {
    val pks = mutable.ArrayBuffer.empty[String]
    val fields = splitTop(defs).flatMap { d0 =>
      val d = d0.trim
      val up = d.toUpperCase
      if (up.startsWith("PRIMARY KEY")) {
        pks ++= d.substring(d.indexOf('(') + 1, d.lastIndexOf(')'))
          .split(",").map(_.trim.toLowerCase)
        None
      } else {
        val parts = d.split("\\s+", 2)
        val name = parts(0).toLowerCase
        val rest = if (parts.length > 1) parts(1) else "STRING"
        if (rest.toUpperCase.contains("PRIMARY KEY")) pks += name
        Some(StructField(name, parseType(rest), nullable = true))
      }
    }
    (StructType(fields), pks.toSeq)
  }

  private def parseType(t0: String): DataType = {
    val t = t0.trim.toUpperCase
    val base = t.takeWhile(c => c.isLetter || c == '_')
    base match {
      case "INT" | "INTEGER" | "MEDIUMINT" | "SERIAL" => IntegerType
      case "BIGINT" | "LONG" | "IDENTITY" => LongType
      case "SMALLINT" => ShortType
      case "TINYINT" => ByteType
      case "DOUBLE" | "FLOAT8" => DoubleType
      case "REAL" | "FLOAT" => FloatType
      case "DECIMAL" | "NUMERIC" | "NUMBER" =>
        val args = """\((\d+)\s*(?:,\s*(\d+))?\)""".r.findFirstMatchIn(t)
        args.map(m => DecimalType(m.group(1).toInt,
          Option(m.group(2)).map(_.toInt).getOrElse(0)))
          .getOrElse(DecimalType(38, 18))
      case "BOOLEAN" | "BOOL" | "BIT" => BooleanType
      case "DATE" => DateType
      case "TIMESTAMP" | "DATETIME" => TimestampType
      case "BINARY" | "VARBINARY" | "BLOB" | "BYTEA" => BinaryType
      case _ => StringType // VARCHAR/CHAR/CLOB/TEXT/UUID/…
    }
  }

  /** Split on top-level commas (ignoring parens and quoted strings). */
  private def splitTop(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case '(' if !inStr => depth += 1; sb += '('
      case ')' if !inStr => depth -= 1; sb += ')'
      case ',' if !inStr && depth == 0 =>
        out += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  private def topLevelIndexOf(s: String, kw: String): Int =
    earliestTopLevel(s, Seq(kw))

  private def earliestTopLevel(s: String, kws: Seq[String]): Int = {
    val up = s.toUpperCase
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case _ =>
      }
      if (!inStr && depth == 0) {
        kws.foreach { kw =>
          if (up.startsWith(kw, i) &&
            (i == 0 || !up.charAt(i - 1).isLetterOrDigit) &&
            (i + kw.length >= up.length || !up.charAt(i + kw.length).isLetterOrDigit))
            return i
        }
      }
      i += 1
    }
    -1
  }

  /** VALUES tuples → DataFrame with the target table's schema. */
  private def parseValueRows(tableName: String, tuples0: String): DataFrame = {
    val t = table(tableName)
    val rows = splitTop(tuples0.trim).map(_.trim).filter(_.nonEmpty).map { tup =>
      require(tup.startsWith("(") && tup.endsWith(")"), s"bad VALUES tuple: $tup")
      splitTop(tup.substring(1, tup.length - 1)).map(v => substSequences(v.trim))
    }
    val selects = rows.map(vs => s"SELECT ${vs.mkString(", ")}")
    spark.sql(selects.mkString(" UNION ALL "))
  }

  /** Positional align + cast to the target schema (SelectUnion.java:113
    * positional discipline); named-column inserts fill missing cols with
    * NULL defaults. */
  private def alignTo(target: DataFrame, cols: Option[Seq[String]], src: DataFrame): DataFrame = {
    cols match {
      case None =>
        require(src.columns.length == target.columns.length,
          s"column count mismatch: ${src.columns.length} vs ${target.columns.length}")
        src.toDF(target.columns.toSeq: _*)
          .select(target.schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
      case Some(names) =>
        val lower = names.map(_.toLowerCase)
        require(src.columns.length == lower.length, "column count mismatch")
        val renamed = src.toDF(lower: _*)
        renamed.select(target.schema.fields.map { f =>
          if (lower.contains(f.name.toLowerCase))
            col(f.name.toLowerCase).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*)
    }
  }

  private def doInsert(name: String, cols: Option[String], src: DataFrame): Unit = {
    val t = table(name)
    val aligned0 = alignTo(t, cols.map(c => splitTop(c).map(_.trim)), src)
    // fill the IDENTITY column where the insert left it NULL: contiguous
    // engine-assigned ids (driver-side counter — same non-parallel contract
    // as the reference's Sequence; documented in README divergences)
    val aligned = identityCols.get(name.toLowerCase) match {
      case Some(idCol) =>
        val start = identityNext(name.toLowerCase)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(monotonically_increasing_id())
        val filled = aligned0.withColumn("__idgen",
            row_number().over(w).cast("long") + (start - 1))
          .withColumn(idCol,
            coalesce(col(idCol), col("__idgen"))
              .cast(t.schema(idCol).dataType))
          .drop("__idgen")
        val n = aligned0.count()
        identityNext(name.toLowerCase) = start + n
        filled.select(t.columns.map(col).toSeq: _*)
      case None => aligned0
    }
    register(name, t.union(aligned))
  }
}
