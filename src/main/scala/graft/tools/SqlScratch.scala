package graft.tools

/** Scratch: run semicolon-separated H2-dialect statements from argv (or a
  * file via @path) through a fresh Engine and print each result/exception.
  * Diagnostic only — not part of the driver contract. */
object SqlScratch {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val en = new graft.sqlfront.Engine(spark)
    val text =
      if (a.length == 1 && a(0).startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(a(0).substring(1))), "UTF-8")
      else a.mkString(" ")
    splitStatements(text).foreach { s =>
      println(s"\n>>> ${s.trim.replaceAll("\\s+", " ").take(160)}")
      try {
        val df = en.sql(s)
        df.show(20, truncate = 40)
      } catch {
        case e: Throwable =>
          println(s"ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(400)}")
      }
    }
    spark.stop()
  }

  /** Literal-aware `;` split (scratch-grade: '…' strings only). */
  private def splitStatements(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    text.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case ';' if !inStr => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.filter(_.trim.nonEmpty).toSeq
  }
}
