package graft.transform

/** Lua 5.4 pattern → Java regex translation.
  *
  * The reference exposes Lua's `string.match/gsub/find` to transforms
  * (`/root/reference/src/transformer.rs` via mlua; examples
  * README.md:500-501,606). We translate the pattern dialect so the same
  * user patterns drive Spark's codegen'd `regexp_extract/replace/rlike`
  * instead of a per-row interpreter.
  *
  * Dialect mapping:
  *   %a→\p{Alpha}  %c→\p{Cntrl}  %d→\d  %g→\p{Graph}  %l→\p{Lower}
  *   %p→\p{Punct}  %s→\s  %u→\p{Upper}  %w→\w  %x→\p{XDigit}
  *   uppercase class → negation; %% and %<punct> → literal escape;
  *   `-` (lazy repeat) → `*?`; `.` `*` `+` `?` `[]` `()` `^` `$` align.
  *   Unsupported Lua-isms (%b pairs, %f frontier, position captures)
  *   throw — caller falls back to the row-function escape hatch.
  */
object LuaPatterns {

  private val classes: Map[Char, String] = Map(
    'a' -> "\\p{Alpha}", 'c' -> "\\p{Cntrl}", 'd' -> "\\d",
    'g' -> "\\p{Graph}", 'l' -> "\\p{Lower}", 'p' -> "\\p{Punct}",
    's' -> "\\s", 'u' -> "\\p{Upper}", 'w' -> "\\w", 'x' -> "\\p{XDigit}"
  )

  final case class UnsupportedPattern(msg: String)
      extends IllegalArgumentException(msg)

  /** Translate a Lua pattern to a Java regex string. */
  def toRegex(lua: String): String = {
    val out = new StringBuilder
    var i = 0
    var inSet = false
    while (i < lua.length) {
      val c = lua.charAt(i)
      c match {
        case '%' =>
          if (i + 1 >= lua.length) throw UnsupportedPattern("trailing %")
          val n = lua.charAt(i + 1)
          if (classes.contains(n)) out ++= classes(n)
          else if (n.isUpper && classes.contains(n.toLower)) {
            val inner = classes(n.toLower)
            if (inSet) throw UnsupportedPattern(s"negated class %$n inside set")
            out ++= s"[^$inner]" // e.g. %D → [^\d]
          } else if (n == 'b' || n == 'f')
            throw UnsupportedPattern(s"%$n not supported")
          else if (n.isDigit) out ++= s"\\$n" // backreference
          else { out += '\\'; out += n }      // %% %. %( ... literal
          i += 1
        case '-' if !inSet =>
          // Lua '-' = lazy zero-or-more of the previous atom
          out ++= "*?"
        case '[' =>
          inSet = true
          out += '['
          if (i + 1 < lua.length && lua.charAt(i + 1) == '^') { out += '^'; i += 1 }
        case ']' =>
          inSet = false
          out += ']'
        case '\\' =>
          out ++= "\\\\" // literal backslash in Lua patterns
        case '{' | '}' =>
          out += '\\'; out += c // not special in Lua
        case ch =>
          out += ch
      }
      i += 1
    }
    out.toString
  }

  /** Count capture groups in a Lua pattern (position captures `()` are
    * unsupported). Drives regexp_extract's group index: 1 if the user
    * captured, 0 (whole match) otherwise. */
  def captureCount(lua: String): Int = {
    var i = 0; var n = 0
    while (i < lua.length) {
      lua.charAt(i) match {
        case '%' => i += 1
        case '(' =>
          if (i + 1 < lua.length && lua.charAt(i + 1) == ')')
            throw UnsupportedPattern("position capture () not supported")
          n += 1
        case _ =>
      }
      i += 1
    }
    n
  }

  /** Lua gsub replacement (%1..%9, %% ) → Java replacement ($1..$9, \$). */
  def replacement(luaRepl: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < luaRepl.length) {
      val c = luaRepl.charAt(i)
      if (c == '%' && i + 1 < luaRepl.length) {
        val n = luaRepl.charAt(i + 1)
        if (n.isDigit) { out += '$'; out += n }
        else if (n == '%') out += '%'
        else { out += c; out += n }
        i += 1
      } else if (c == '$') out ++= "\\$"
      else if (c == '\\') out ++= "\\\\"
      else out += c
      i += 1
    }
    out.toString
  }
}
