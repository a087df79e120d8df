package graft
import graft.extract.{ExtractPolicy, Extractor}
object ProfileX {
  def main(args: Array[String]): Unit = {
    val in = getClass.getResourceAsStream("/benchdocs/html-parsing-spec.html")
    val bytes = in.readAllBytes(); in.close()
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    var i = 0
    while (i < 1500) { ex.extractHtml(bytes, Vector.empty, Vector.empty); i += 1 }
    println("done")
  }
}
