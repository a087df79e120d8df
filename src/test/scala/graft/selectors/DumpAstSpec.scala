package graft.selectors

import org.scalatest.funsuite.AnyFunSuite

/** Pins the selectors_ast-style debug dump (graft.DumpAst): a stable
  * textual form of the compiled program, so selector-bug triage can diff
  * dumps across changes. If a compiler change legitimately alters the
  * automaton, update these strings deliberately.
  */
class DumpAstSpec extends AnyFunSuite {

  test("combined list: trie sharing, jumps, attr-need, flags") {
    assert(graft.DumpAst.render(Seq("div > .note, [href]")) ==
      """selector 0: div > .note, [href]
        |program: 3 instrs, entry points: [0, 2]
        |  #0   div  (name-only)  jumps> [1]
        |  #1   .note  matched: [0]
        |  #2   [href]  matched: [0]
        |attr-need: ALL tags
        |flags: nthOfType=false, nameOnlyProgram=false
        |""".stripMargin)
  }

  test("two payloads share a prefix; hereditary edges and name-only attr-need") {
    val out = graft.DumpAst.render(Seq("article p", "article span.x"))
    assert(out ==
      """selector 0: article p
        |selector 1: article span.x
        |program: 3 instrs, entry points: [0]
        |  #0   article  (name-only)  hereditary~ [1, 2]
        |  #1   p  (name-only)  matched: [0]
        |  #2   span.x  matched: [1]
        |attr-need: tags [article, p, span]
        |flags: nthOfType=false, nameOnlyProgram=false
        |""".stripMargin, out)
  }

  test("predicate rendering: attr ops, case flags, :not, :nth, fnv names") {
    val out = graft.DumpAst.render(
      Seq("""a[href^="http" i]:not(.ext):nth-child(2n+1)""", "emu-alg"))
    assert(out.contains("""[href^="http" i]"""), out)
    assert(out.contains(":not(.ext)"), out)
    assert(out.contains(":nth-child(2n+1)"), out)
    assert(out.contains("emu-alg(fnv)"), out) // dashed name: unhashable, FNV-dispatched
  }
}
