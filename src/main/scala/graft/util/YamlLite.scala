package graft.util

import scala.collection.mutable

/** Dependency-free parser for the YAML subset the reference's config
  * files actually use (gtfsduckdb-realtime.yaml; loaded by
  * __main__.py via yaml.safe_load): indentation-nested block maps,
  * block lists (including lists of maps, `- key: value`), flow lists
  * (`[a, b]`), quoted and plain scalars, `null`/`~`, booleans,
  * integers, floats, and ` #` comments.
  *
  * Deliberately NOT a full YAML implementation — no anchors, tags,
  * multi-line scalars, or flow maps. Unparseable structure raises
  * IllegalArgumentException rather than guessing.
  *
  * Result tree: Map[String, Any] / List[Any] / String / Long /
  * Double / Boolean / null.
  */
object YamlLite {

  private final case class Line(indent: Int, text: String, lineNo: Int)

  def parse(yaml: String): Any = {
    val lines = prepare(yaml)
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (value, rest) = parseBlock(lines, lines.head.indent)
      require(rest.isEmpty, s"trailing content at line ${rest.head.lineNo}: '${rest.head.text}'")
      value
    }
  }

  /** Strip comments and blank lines, compute indents. A `#` only
    * starts a comment at line start or after whitespace — `topic:
    * realtime/alerts/#` keeps its hash (YAML spec rule the reference
    * config relies on).
    */
  private def prepare(yaml: String): List[Line] =
    yaml.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val noTabs = raw.replace("\t", "  ")
      val decommented = stripComment(noTabs)
      val trimmed = decommented.trim
      if (trimmed.isEmpty) None
      else Some(Line(decommented.takeWhile(_ == ' ').length, trimmed, i + 1))
    }.toList

  private def stripComment(s: String): String = {
    var inSingle = false
    var inDouble = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inDouble) inSingle = !inSingle
      else if (c == '"' && !inSingle) inDouble = !inDouble
      else if (c == '#' && !inSingle && !inDouble && (i == 0 || s.charAt(i - 1).isWhitespace))
        return s.substring(0, i)
      i += 1
    }
    s
  }

  /** Parse one block (map or list) whose items sit at exactly
    * `indent`; returns the value and the unconsumed lines.
    */
  private def parseBlock(lines: List[Line], indent: Int): (Any, List[Line]) =
    if (lines.head.text.startsWith("- ") || lines.head.text == "-") parseList(lines, indent)
    else parseMap(lines, indent)

  private def parseMap(lines: List[Line], indent: Int): (Any, List[Line]) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var rest = lines
    while (rest.nonEmpty && rest.head.indent == indent && !rest.head.text.startsWith("- ")) {
      val l = rest.head
      val colon = scalarColonIndex(l.text)
      require(colon >= 0, s"expected 'key: value' at line ${l.lineNo}: '${l.text}'")
      val key = unquote(l.text.substring(0, colon).trim)
      val after = l.text.substring(colon + 1).trim
      rest = rest.tail
      if (after.nonEmpty) {
        out(key) = scalar(after)
      } else {
        // nested block: everything more-indented than this key — OR a
        // block sequence at the SAME indent as the key, which the
        // YAML spec allows ("key:\n- item") and yaml.safe_load (the
        // reference's loader) accepts
        if (rest.nonEmpty && rest.head.indent > indent) {
          val (child, r2) = parseBlock(rest, rest.head.indent)
          out(key) = child
          rest = r2
        } else if (rest.nonEmpty && rest.head.indent == indent &&
          (rest.head.text.startsWith("- ") || rest.head.text == "-")) {
          val (child, r2) = parseList(rest, indent)
          out(key) = child
          rest = r2
        } else out(key) = null
      }
    }
    require(
      rest.isEmpty || rest.head.indent <= indent,
      s"bad indentation at line ${rest.head.lineNo}: '${rest.head.text}'")
    (out.toMap, rest)
  }

  private def parseList(lines: List[Line], indent: Int): (Any, List[Line]) = {
    val out = mutable.ListBuffer.empty[Any]
    var rest = lines
    while (rest.nonEmpty && rest.head.indent == indent &&
      (rest.head.text.startsWith("- ") || rest.head.text == "-")) {
      val l = rest.head
      val body = if (l.text == "-") "" else l.text.substring(2).trim
      rest = rest.tail
      val itemIndent = indent + 2 // children of "- key: v" sit at the key's column
      if (body.isEmpty) {
        // "-" alone: nested block below
        if (rest.nonEmpty && rest.head.indent > indent) {
          val (child, r2) = parseBlock(rest, rest.head.indent)
          out += child
          rest = r2
        } else out += null
      } else if (scalarColonIndex(body) >= 0) {
        // list of maps: re-inject the inline first key at the item indent
        val virtualFirst = Line(itemIndent, body, l.lineNo)
        val (block, after) = splitDeeper(rest, indent)
        val (child, leftover) = parseMap(virtualFirst :: block, itemIndent)
        require(leftover.isEmpty, s"bad list-item structure at line ${l.lineNo}")
        out += child
        rest = after
      } else out += scalar(body)
    }
    (out.toList, rest)
  }

  /** Lines strictly deeper than `indent` (the continuation of a list
    * item), and the remainder.
    */
  private def splitDeeper(lines: List[Line], indent: Int): (List[Line], List[Line]) =
    (lines.takeWhile(_.indent > indent), lines.dropWhile(_.indent > indent))

  /** Index of the `:` separating key from value at nesting depth 0
    * (outside quotes/brackets); -1 if the line is not a mapping.
    * A colon only separates when followed by space/EOL (YAML rule —
    * `https://x` inside a value is not a mapping).
    */
  private def scalarColonIndex(s: String): Int = {
    var inSingle = false
    var inDouble = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inDouble) inSingle = !inSingle
      else if (c == '"' && !inSingle) inDouble = !inDouble
      else if (!inSingle && !inDouble) {
        if (c == '[') depth += 1
        else if (c == ']') depth -= 1
        else if (c == ':' && depth == 0 && (i + 1 == s.length || s.charAt(i + 1) == ' '))
          return i
      }
      i += 1
    }
    -1
  }

  private def scalar(s: String): Any = s match {
    case "" => null
    case "null" | "~" | "Null" | "NULL" => null
    case "true" | "True" | "TRUE" => true
    case "false" | "False" | "FALSE" => false
    case q if q.length >= 2 && ((q.head == '\'' && q.last == '\'') || (q.head == '"' && q.last == '"')) =>
      unquote(q)
    case f if f.startsWith("[") && f.endsWith("]") =>
      val inner = f.substring(1, f.length - 1).trim
      if (inner.isEmpty) Nil else splitFlow(inner).map(x => scalar(x.trim))
    case n =>
      toLong(n).getOrElse(toDouble(n).getOrElse(n))
  }

  private def splitFlow(s: String): List[String] = {
    val parts = mutable.ListBuffer.empty[String]
    var inSingle = false
    var inDouble = false
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inDouble) inSingle = !inSingle
      else if (c == '"' && !inSingle) inDouble = !inDouble
      else if (!inSingle && !inDouble) {
        if (c == '[') depth += 1
        else if (c == ']') depth -= 1
        else if (c == ',' && depth == 0) { parts += s.substring(start, i); start = i + 1 }
      }
      i += 1
    }
    parts += s.substring(start)
    parts.toList
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s.length >= 2 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    else s

  private def toLong(s: String): Option[Long] =
    try { if (s.matches("[+-]?[0-9]+")) Some(s.toLong) else None } catch { case _: NumberFormatException => None }

  private def toDouble(s: String): Option[Double] =
    try { if (s.matches("[+-]?([0-9]*\\.[0-9]+|[0-9]+\\.[0-9]*)([eE][+-]?[0-9]+)?")) Some(s.toDouble) else None }
    catch { case _: NumberFormatException => None }
}
