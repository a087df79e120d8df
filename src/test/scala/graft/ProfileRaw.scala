package graft
import graft.extract.{ExtractPolicy, Extractor}
object ProfileRaw {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 1) args(1) else "ecma402-spec.html"
    val iters = if (args.length > 0) args(0).toInt else 5000
    val in = getClass.getResourceAsStream(s"/benchdocs/$doc")
    val bytes = in.readAllBytes(); in.close()
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    var i = 0
    while (i < iters) { ex.extractRaw(bytes, Vector.empty, Vector.empty); i += 1 }
    println("done")
  }
}
