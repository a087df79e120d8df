package graft

/** Minimal JSON reader for the fixture info files (flat objects of strings
  * and one nested string->string object). Not a general JSON parser.
  */
object TestJson {
  def parseObj(s: String): Map[String, Any] = new P(s).obj()

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c, s"expected $c at $i")
      i += 1
    }
    def obj(): Map[String, Any] = {
      expect('{')
      val m = Map.newBuilder[String, Any]
      ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return m.result() }
      var more = true
      while (more) {
        ws()
        val k = str()
        expect(':')
        ws()
        val v: Any = s.charAt(i) match {
          case '{' => obj()
          case '"' => str()
          case _   => throw new IllegalArgumentException(s"unexpected value at $i")
        }
        m += (k -> v)
        ws()
        if (i < s.length && s.charAt(i) == ',') { i += 1 } else more = false
      }
      expect('}')
      m.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => sb.append(c)
          }
        } else sb.append(s.charAt(i))
        i += 1
      }
      i += 1
      sb.toString
    }
  }

  def readFile(path: String): String = {
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  def resourceDir(name: String): java.io.File = {
    val f = new java.io.File(s"src/test/resources/$name")
    require(f.isDirectory, s"missing test resource dir $name")
    f
  }
}
