package graft

import graft.core.TagHash
import graft.selectors._

/** Compiled-selector debug dump — parity with the reference's
  * `tools/selectors_ast` helper (/root/reference/DEVELOPING.md:46-52,
  * `cargo run path/to/selectors_ast "div > .note"`): prints the compiled
  * [[Program]] for a selector list in a stable textual form, for
  * selector-bug triage and fixture diffing.
  *
  * Usage: `sbt "runMain graft.DumpAst \"div > .note, [href]\" \"img\""`
  * — each argument is one selector list, compiled with its index as the
  * payload match id (the same shape `Rewriter` feeds
  * [[Program.compile]]).
  */
object DumpAst {

  private def caseFlag(m: Int): String = m match {
    case CaseMode.Insensitive       => " i"
    case CaseMode.ExplicitSensitive => " s"
    case CaseMode.HtmlLegacy        => " legacy"
    case _                          => ""
  }

  private def attrOp(op: Int): String = op match {
    case AttrOp.Exists    => ""
    case AttrOp.Eq        => "="
    case AttrOp.Includes  => "~="
    case AttrOp.DashMatch => "|="
    case AttrOp.Prefix    => "^="
    case AttrOp.Suffix    => "$="
    case AttrOp.Substring => "*="
  }

  private def simple(s: SimpleSel): String = s match {
    case TypeSel(lower, hash) =>
      if (hash == TagHash.Empty) s"$lower(fnv)" else lower
    case UniversalSel   => "*"
    case IdSel(id)      => s"#$id"
    case ClassSel(cls)  => s".$cls"
    case a: AttrSel =>
      if (a.op == AttrOp.Exists) s"[${a.lowerName}]"
      else s"[${a.lowerName}${attrOp(a.op)}${'"'}${a.value}${'"'}${caseFlag(a.caseMode)}]"
    case NotSel(inner)  => inner.map(simple).mkString(":not(", "", ")")
    case NthSel(ofType, a, b) =>
      val kind = if (ofType) "nth-of-type" else "nth-child"
      s":$kind(${a}n+$b)"
  }

  private def compound(simples: Array[SimpleSel]): String =
    if (simples.isEmpty) "*" else simples.map(simple).mkString

  /** Stable textual rendering of a compiled program. */
  def render(selectors: Seq[String]): String = {
    val program = Program.compile(
      selectors.zipWithIndex.map { case (s, i) => (SelectorParser.parse(s), i) })
    val sb = new StringBuilder
    selectors.zipWithIndex.foreach { case (s, i) => sb.append(s"selector $i: $s\n") }
    sb.append(s"program: ${program.instrs.length} instrs, ")
    sb.append(s"entry points: ${program.entryPoints.mkString("[", ", ", "]")}\n")
    program.instrs.zipWithIndex.foreach { case (in, idx) =>
      sb.append(f"  #$idx%-3d ${compound(in.simples)}")
      if (in.nameOnly) sb.append("  (name-only)")
      if (in.matchedIds.nonEmpty)
        sb.append(s"  matched: ${in.matchedIds.mkString("[", ", ", "]")}")
      if (in.jumps.nonEmpty)
        sb.append(s"  jumps> ${in.jumps.mkString("[", ", ", "]")}")
      if (in.hereditary.nonEmpty)
        sb.append(s"  hereditary~ ${in.hereditary.mkString("[", ", ", "]")}")
      sb.append('\n')
    }
    val need = program.scanAttrNeed
    if (need.allTags) sb.append("attr-need: ALL tags\n")
    else {
      val named = (need.dumpHashes.map(TagHash.toName) ++ need.dumpNames).sorted
      sb.append(s"attr-need: tags ${named.mkString("[", ", ", "]")}\n")
    }
    sb.append(s"flags: nthOfType=${program.enableNthOfType}, ")
    sb.append(s"nameOnlyProgram=${program.hasOnlyNameOnlyPreds}\n")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.DumpAst \"<selector list>\" [more...]")
      sys.exit(2)
    }
    print(render(args.toSeq))
  }
}
