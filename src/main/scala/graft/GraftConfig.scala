package graft

/** File-driven runtime configuration for the detector / curation entry
  * points — the reference's `HogConfig.scala:37-115` accessor surface
  * over its `scripts/conf/sflow.conf` key names, so a deployed
  * [[GraftApp]]/[[GraftContinuousApp]]/[[CurateApp]] can change any
  * threshold or exclusion list without recompiling.
  *
  * The file format is the HOCON subset those conf files actually use —
  * `section { key = "value" }` blocks (nesting allowed), bare or quoted
  * scalar values, `#`/`//` comments, `Set(...)` literals for exclusion
  * lists, last duplicate key wins. Parsed with a ~40-line reader because
  * the runtime classpath ships no config library and the project rule is
  * zero extra dependencies; accessors mirror the reference's
  * (`getInt`/`getLong`/`getDouble`/`getSetString`/`getSetInt`, default
  * on missing key, empty value, or parse failure — the reference's
  * fail-soft contract).
  */
final class GraftConfig private[graft] (val entries: Map[String, String]) {

  def getString(key: String, default: String): String =
    entries.get(key).filter(_.nonEmpty).getOrElse(default)

  private def numeric[T](key: String, default: T)(parse: String => T): T =
    entries.get(key).filter(_.nonEmpty) match {
      case None => default
      case Some(v) =>
        try parse(v.trim)
        catch { case _: NumberFormatException =>
          System.err.println(s"[GraftConfig] unparseable $key => '$v'; using default $default")
          default
        }
    }

  def getInt(key: String, default: Int): Int = numeric(key, default)(_.toInt)
  def getLong(key: String, default: Long): Long = numeric(key, default)(_.toLong)
  def getDouble(key: String, default: Double): Double = numeric(key, default)(_.toDouble)

  /** `Set(a,b,c)` literal (the reference's exclusion-list syntax);
    * `Set()` is explicitly empty, a missing key yields the default.
    */
  def getSetString(key: String, default: Set[String]): Set[String] =
    entries.get(key).filter(_.nonEmpty) match {
      case None => default
      case Some(v) =>
        val body = v.trim.stripPrefix("Set(").stripSuffix(")")
        if (!v.trim.startsWith("Set(") || !v.trim.endsWith(")")) {
          System.err.println(s"[GraftConfig] $key => '$v' is not a Set(...) literal; using default")
          default
        } else if (body.trim.isEmpty) Set.empty
        else body.split(",").map(_.trim).filter(_.nonEmpty).toSet
    }

  def getSetInt(key: String, default: Set[Int]): Set[Int] =
    try getSetString(key, default.map(_.toString)).map(_.toInt)
    catch { case _: NumberFormatException =>
      System.err.println(s"[GraftConfig] $key is not all-integer; using default")
      default
    }

  /** The reference's `<section>.disabled` convention: any non-zero
    * disables the detector (`HogSFlow.scala:154-170`).
    */
  def isDisabled(section: String): Boolean = getInt(s"$section.disabled", 0) != 0
}

object GraftConfig {

  val empty = new GraftConfig(Map.empty)

  /** Parse conf text. Sections flatten to dotted key prefixes; values
    * keep their literal form (quotes stripped) for the typed accessors.
    */
  def parse(text: String): GraftConfig = {
    val entries = scala.collection.mutable.Map.empty[String, String]
    val stack = scala.collection.mutable.Stack.empty[String]
    val assign = """([A-Za-z0-9_.-]+)\s*=\s*(.*)""".r
    val sectionOpen = """([A-Za-z0-9_.-]+)\s*\{""".r
    def stripComment(line: String): String = {
      // comments start at # or // outside double quotes
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '"') inQ = !inQ
        else if (!inQ && (c == '#' || (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
          return line.substring(0, i)
        i += 1
      }
      line
    }
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1)
      else t
    }
    text.linesIterator.map(stripComment)
      // one-line blocks (`name { key = "v" }`) split into logical lines
      .flatMap(_.replace("{", "{\n").replace("}", "\n}\n").linesIterator.toSeq)
      .map(_.trim).filter(_.nonEmpty).foreach {
        case sectionOpen(name) => stack.push(name)
        case "}" => if (stack.nonEmpty) stack.pop()
        case assign(key, value) =>
          val full = (stack.toList.reverse :+ key).mkString(".")
          entries(full) = unquote(value) // last duplicate wins, as in HOCON
        case other =>
          System.err.println(s"[GraftConfig] ignoring unparseable line: '$other'")
      }
    new GraftConfig(entries.toMap)
  }

  /** Load a conf file; a missing/unreadable path is the all-defaults
    * config (cold start works without any conf deployed).
    */
  def load(path: String): GraftConfig = {
    val f = new java.io.File(path)
    if (!f.isFile) {
      System.err.println(s"[GraftConfig] no conf file at $path; using defaults")
      empty
    } else parse(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
  }
}
