package graft

/** Shared minimal JSON string escaper for the hand-rolled JSON emitters
  * (Bench's record line, Serve's response bodies) — one definition so an
  * escaping fix can never silently miss a copy.
  */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""
}
