package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Span-sequence golden fixtures: extraction output over the reference's
  * own fixture documents (css3-modsel sources + regression inputs),
  * frozen as JSONL goldens. The north rule's per-row invariant is
  * span-sequence equality (kind, text, media_ref, order) per doc — these
  * fixtures pin it across rounds/refactors.
  *
  * Regenerate (after an INTENTIONAL semantic change only):
  *   sbt "Test/runMain graft.extract.RegenGoldens"
  */
class GoldenSpanSpec extends AnyFunSuite {

  test("extraction spans match the frozen goldens") {
    val goldenFile = new java.io.File(GoldenSpans.GoldenPath)
    assert(goldenFile.exists, s"missing goldens; run Test/runMain graft.extract.RegenGoldens")
    val golden = GoldenSpans.readGoldens()
    val actual = GoldenSpans.computeAll()
    assert(actual.size == golden.size,
      s"fixture count changed: ${actual.size} vs ${golden.size}")
    var checked = 0
    for ((id, spans) <- actual) {
      assert(golden.contains(id), s"new fixture $id not in goldens")
      assert(spans == golden(id), s"span sequence changed for $id")
      checked += 1
    }
    info(s"verified $checked golden span sequences")
    assert(checked >= 100)
  }
}

object GoldenSpans {
  val GoldenPath = "src/test/resources/golden_spans.jsonl"

  /** doc-id -> encoded span sequence, for every fixture document. */
  def computeAll(): Map[String, String] = {
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    val out = Map.newBuilder[String, String]

    val selDir = new java.io.File("src/test/resources/selector_matching")
    for (f <- selDir.listFiles().filter(_.getName.endsWith(".src.html")).sortBy(_.getName)) {
      val html = java.nio.file.Files.readAllBytes(f.toPath)
      out += (s"sel:${f.getName}" -> encode(ex.extractHtml(html, Vector.empty, Vector.empty)))
    }
    val regDir = new java.io.File("src/test/resources/regression")
    for (f <- regDir.listFiles().filter(_.getName.endsWith(".dat")).sortBy(_.getName)) {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      var idx = 0
      val lines = text.split("\n", -1)
      var i = 0
      while (i < lines.length) {
        if (lines(i) == "#data") {
          val buf = new StringBuilder
          i += 1
          while (i < lines.length && lines(i) != "#") {
            if (buf.nonEmpty) buf.append('\n')
            buf.append(lines(i)); i += 1
          }
          out += (s"dat:${f.getName}:$idx" -> encode(ex.extractString(buf.toString)))
          idx += 1
        }
        i += 1
      }
    }
    out.result()
  }

  /** Compact stable encoding of a span sequence (order-preserving). */
  def encode(r: ExtractResult): String = {
    val sb = new StringBuilder
    if (r.error != null) sb.append("ERR=").append(r.error).append('|')
    r.spans.foreach { s =>
      sb.append(s.kind).append('@').append(s.offset).append(':')
      sb.append(java.util.Base64.getEncoder.encodeToString(
        (if (s.kind == "text") s.text else s.media_ref).getBytes("UTF-8")))
      sb.append('|')
    }
    sb.toString
  }

  def readGoldens(): Map[String, String] = {
    val src = scala.io.Source.fromFile(GoldenPath, "UTF-8")
    try src.getLines().map { l =>
      val i = l.indexOf('\t')
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    finally src.close()
  }
}

/** Writes/refreshes the golden file. */
object RegenGoldens {
  def main(args: Array[String]): Unit = {
    val all = GoldenSpans.computeAll().toSeq.sortBy(_._1)
    val sb = new StringBuilder
    all.foreach { case (k, v) => sb.append(k).append('\t').append(v).append('\n') }
    java.nio.file.Files.write(java.nio.file.Paths.get(GoldenSpans.GoldenPath),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote ${all.size} goldens to ${GoldenSpans.GoldenPath}")
  }
}
