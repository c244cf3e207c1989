package graft.config

import graft.etl.ProcessorError

/** Minimal TOML-subset parser covering exactly what the reference's
  * config format uses (reference: endpoints_publicos.toml:1-168 —
  * verified to contain only these constructs):
  *
  *  - full-line and trailing `#` comments, blank lines
  *  - table headers `[a.b.c]` with bare or basic-quoted dotted keys
  *  - `key = "value"` pairs with bare keys and basic (double-quoted)
  *    string values, including standard backslash escapes
  *
  * Anything outside the subset (arrays, inline tables, multiline
  * strings, literal strings, numbers/booleans/dates) fails with a
  * positioned error rather than a silent misparse — the same fail-fast
  * posture as the reference's `toml::from_str` error path
  * (reference: src/models.rs:56-63).
  *
  * The output is a flat map from dotted table path to that table's
  * key/value pairs, in declaration order; [[Config.loadTomlString]]
  * layers the `api → endpoints → group` shape on top.
  */
object Toml {

  final case class Table(path: List[String], pairs: Vector[(String, String)])

  /** Parse the subset; returns tables in declaration order. Top-level
    * (pre-header) key/value pairs land in a root table with an empty
    * path.
    *
    * Duplicates are ERRORS, as in real TOML (and serde's strict
    * decode): redefining a table path or repeating a key within a
    * table fails with the offending line instead of last-wins — a
    * typo'd config must not load with a route silently dropped.
    */
  def parse(text: String): Either[ProcessorError, Vector[Table]] = {
    val tables = Vector.newBuilder[Table]
    val seenPaths = scala.collection.mutable.HashSet.empty[List[String]]
    val seenKeys = scala.collection.mutable.HashSet.empty[String]
    var current = Table(Nil, Vector.empty)
    var started = false
    val lines = text.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val lineNo = i + 1
      val line = stripComment(lines(i)).trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          if (line.startsWith("[["))
            return Left(err(lineNo, "array-of-tables is outside the supported subset"))
          if (!line.endsWith("]"))
            return Left(err(lineNo, "unterminated table header"))
          val inner = line.substring(1, line.length - 1).trim
          parseDottedKey(inner) match {
            case Right(path) =>
              if (!seenPaths.add(path))
                return Left(
                  err(lineNo, s"duplicate table [${path.mkString(".")}]"))
              if (started || current.pairs.nonEmpty) tables += current
              current = Table(path, Vector.empty)
              seenKeys.clear()
              started = true
            case Left(msg) => return Left(err(lineNo, msg))
          }
        } else {
          val eq = line.indexOf('=')
          if (eq < 0) return Left(err(lineNo, s"expected 'key = \"value\"', got '$line'"))
          val key = line.substring(0, eq).trim
          val raw = line.substring(eq + 1).trim
          if (key.isEmpty) return Left(err(lineNo, "empty key"))
          if (!isBareKey(key) && !isQuoted(key))
            return Left(err(lineNo, s"unsupported key syntax '$key'"))
          parseBasicString(raw) match {
            case Right(v) =>
              val k = if (isQuoted(key)) unquoteUnchecked(key) else key
              if (!seenKeys.add(k)) {
                val where =
                  if (current.path.isEmpty) "at top level"
                  else s"in table [${current.path.mkString(".")}]"
                return Left(err(lineNo, s"duplicate key '$k' $where"))
              }
              current = current.copy(pairs = current.pairs :+ (k -> v))
            case Left(msg) => return Left(err(lineNo, msg))
          }
        }
      }
      i += 1
    }
    if (started || current.pairs.nonEmpty) tables += current
    Right(tables.result())
  }

  private def err(line: Int, msg: String): ProcessorError =
    ProcessorError.Config(s"TOML line $line: $msg")

  /** Trailing comments start at a '#' outside a quoted string. */
  private def stripComment(line: String): String = {
    var inStr = false
    var escaped = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (escaped) escaped = false
      else if (c == '\\' && inStr) escaped = true
      else if (c == '"') inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def isBareKey(s: String): Boolean =
    s.nonEmpty && s.forall(c =>
      c.isLetterOrDigit && c < 128 || c == '_' || c == '-')

  private def isQuoted(s: String): Boolean =
    s.length >= 2 && s.charAt(0) == '"' && s.charAt(s.length - 1) == '"'

  private def unquoteUnchecked(s: String): String =
    s.substring(1, s.length - 1)

  private def parseDottedKey(s: String): Either[String, List[String]] = {
    if (s.isEmpty) return Left("empty table header")
    val parts = s.split("\\.", -1).map(_.trim).toList
    if (parts.exists(_.isEmpty)) Left(s"empty segment in table header '[$s]'")
    else if (!parts.forall(p => isBareKey(p) || isQuoted(p)))
      Left(s"unsupported table header syntax '[$s]'")
    else Right(parts.map(p => if (isQuoted(p)) unquoteUnchecked(p) else p))
  }

  /** Basic (double-quoted) strings only, with the standard escapes the
    * TOML spec defines for them.
    */
  private def parseBasicString(raw: String): Either[String, String] = {
    if (raw.length < 2 || raw.charAt(0) != '"')
      return Left(s"only basic string values are supported, got '$raw'")
    val sb = new StringBuilder
    var i = 1
    while (i < raw.length) {
      raw.charAt(i) match {
        case '"' =>
          return if (i == raw.length - 1) Right(sb.toString)
          else Left(s"trailing content after closing quote in '$raw'")
        case '\\' =>
          if (i + 1 >= raw.length) return Left("dangling escape")
          raw.charAt(i + 1) match {
            case 'n'  => sb.append('\n'); i += 1
            case 't'  => sb.append('\t'); i += 1
            case 'r'  => sb.append('\r'); i += 1
            case '"'  => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case 'u' =>
              if (i + 5 >= raw.length) return Left("truncated \\u escape")
              val hex = raw.substring(i + 2, i + 6)
              try { sb.append(Integer.parseInt(hex, 16).toChar); i += 5 }
              catch { case _: NumberFormatException => return Left(s"bad \\u escape '$hex'") }
            case other => return Left(s"unsupported escape '\\$other'")
          }
          i += 1
        case c =>
          sb.append(c)
          i += 1
      }
    }
    Left(s"unterminated string '$raw'")
  }
}
