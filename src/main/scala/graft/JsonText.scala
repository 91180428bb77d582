package graft

/** JSON string escaping shared by the Verify and Bench mains — one
  * implementation so the two driver-contract JSON emitters cannot drift.
  * Escapes backslash, quote, and ALL control chars (<0x20): a tab or CR
  * in builder-authored SQL or an error message would otherwise make the
  * driver's json.load fail and silently zero the round's results.
  */
private[graft] object JsonText {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
