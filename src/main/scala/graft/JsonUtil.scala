package graft

/** Shared JSON string escaping for the repo's line-oriented JSON writers
  * (Verify's oracle dump, the page-source staging files, the streaming
  * audit log). All three formats are newline-delimited, so EVERY control
  * character (< 0x20) must be escaped — an unescaped newline in a value
  * (e.g. a stack trace in an audit record) makes one logical record span
  * physical lines and corrupts the file for any line-based reader.
  */
object JsonUtil {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Escaped and double-quoted. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
