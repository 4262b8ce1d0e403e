package graft.sqlfront

import java.io.ByteArrayOutputStream
import java.net.URI
import javax.tools.{JavaFileObject, SimpleJavaFileObject, ToolProvider}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-memory Java source compilation for `CREATE ALIAS … AS $$source$$`
  * (db/util/SourceCompiler.java — the reference shells the source out to
  * javac via a temp directory; here the JDK's `javax.tools` system
  * compiler compiles straight to memory, no files). The wrapping contract
  * is the reference's exactly (SourceCompiler.java:169): the alias source
  * is a METHOD body-with-signature, wrapped as
  * `public class <name> { public static <source> }`, and the callable
  * entry point is the first public static method of the compiled class
  * (SourceCompiler.getMethod).
  *
  * Compilation is cached per (className, source) and re-runs lazily in
  * any JVM that asks (executors compile once each on a real cluster —
  * the closure ships only the two strings, never a Class). */
private[sqlfront] object SourceCompiler {

  private val cache = TrieMap.empty[(String, String), Class[_]]

  /** The reference's source-wrapping rules (SourceCompiler.java:144-169):
    * a source starting with `package ` compiles VERBATIM; otherwise an
    * optional `imports @CODE body` split supplies custom imports (default
    * java.util/math/sql star-imports), and the body is wrapped as the
    * public static member of a class named after the alias. */
  private def completeSource(className: String, methodSource: String): String = {
    val trimmed = methodSource.trim
    if (trimmed.startsWith("package ")) trimmed
    else {
      val endImport = trimmed.indexOf("@CODE")
      val (importCode, body) =
        if (endImport >= 0)
          (trimmed.substring(0, endImport),
            trimmed.substring(endImport + "@CODE".length))
        else
          ("import java.util.*;\nimport java.math.*;\nimport java.sql.*;\n",
            trimmed)
      s"$importCode\npublic class $className {\n    public static $body\n}\n"
    }
  }

  def compile(className: String, methodSource: String): Class[_] =
    cache.getOrElseUpdate((className, methodSource), {
      val src = completeSource(className, methodSource)
      val compiler = ToolProvider.getSystemJavaCompiler
      require(compiler != null,
        "no system Java compiler available (JRE-only runtime cannot run CREATE ALIAS … AS 'source')")
      val diags = new javax.tools.DiagnosticCollector[JavaFileObject]
      val stdFm = compiler.getStandardFileManager(diags, null, null)
      val out = TrieMap.empty[String, ByteArrayOutputStream]
      val fm = new javax.tools.ForwardingJavaFileManager[javax.tools.JavaFileManager](stdFm) {
        override def getJavaFileForOutput(location: javax.tools.JavaFileManager.Location,
            name: String, kind: JavaFileObject.Kind, sibling: javax.tools.FileObject): JavaFileObject =
          new SimpleJavaFileObject(
              URI.create("mem:///" + name.replace('.', '/') + kind.extension), kind) {
            override def openOutputStream(): java.io.OutputStream = {
              val b = new ByteArrayOutputStream()
              out(name) = b
              b
            }
          }
      }
      // the unit's file name must match the public class it declares — for
      // package-verbatim sources that is the declared name, not the alias
      val unitName = "\\bclass\\s+(\\w+)".r
        .findFirstMatchIn(src).map(_.group(1)).getOrElse(className)
      val unit = new SimpleJavaFileObject(
          URI.create("string:///" + unitName + ".java"), JavaFileObject.Kind.SOURCE) {
        override def getCharContent(ignoreEncodingErrors: Boolean): CharSequence = src
      }
      val ok =
        try compiler.getTask(null, fm, diags, null, null, java.util.List.of(unit)).call()
        finally stdFm.close()
      if (!ok) {
        val msg = diags.getDiagnostics.asScala.map(_.toString).mkString("; ")
        throw new IllegalArgumentException(s"alias source failed to compile: $msg\n$src")
      }
      val loader = new ClassLoader(getClass.getClassLoader) {
        override def findClass(name: String): Class[_] =
          out.get(name) match {
            case Some(b) =>
              val bytes = b.toByteArray
              defineClass(name, bytes, 0, bytes.length)
            case None => throw new ClassNotFoundException(name)
          }
      }
      // package-verbatim sources compile under their own (possibly
      // package-qualified) name — load whatever single class came out
      val target =
        if (out.contains(className)) className
        else out.keys.filterNot(_.contains("$")).toSeq match {
          case Seq(one) => one
          case _ => className
        }
      loader.loadClass(target)
    })

  /** First public static non-synthetic method — the reference's
    * SourceCompiler.getMethod contract (the alias source declares its
    * entry method first; helpers may follow). Reflection does not
    * guarantee declaration order, so candidates are ordered by the first
    * occurrence of `name(` in the source text — the entry method's own
    * declaration always precedes any later helper's. */
  def entryMethod(cls: Class[_], methodSource: String): java.lang.reflect.Method = {
    val candidates = cls.getDeclaredMethods
      .filter(m => java.lang.reflect.Modifier.isStatic(m.getModifiers) &&
        java.lang.reflect.Modifier.isPublic(m.getModifiers) && !m.isSynthetic)
    if (candidates.isEmpty)
      throw new IllegalArgumentException(
        s"alias source compiled but has no public static method: ${cls.getName}")
    candidates.minBy { m =>
      val i = ("\\b" + java.util.regex.Pattern.quote(m.getName) + "\\s*\\(").r
        .findFirstMatchIn(methodSource).map(_.start).getOrElse(-1)
      (if (i < 0) Int.MaxValue else i, m.getName)
    }
  }
}
