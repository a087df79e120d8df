package graft
import graft.rewrite.{ElementHandlers, Rewriter}
object ProfileMix {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 1) args(1) else "cloudflare.com.html"
    val iters = if (args.length > 0) args(0).toInt else 4000
    val in = getClass.getResourceAsStream(s"/benchdocs/$doc")
    val bytes = in.readAllBytes(); in.close()
    var n = 0
    val ch = ElementHandlers(element = _ => n += 1)
    val rw = new Rewriter(Seq("div" -> ch, ".note" -> ch, "[href]" -> ch),
      strict = false, produceOutput = false)
    var i = 0
    while (i < iters) { rw.rewriteToBytes(bytes); i += 1 }
    println(s"done $n")
  }
}
