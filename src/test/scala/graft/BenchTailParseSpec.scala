package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Driver-simulator for the bench headline (round-5 verdict ask #1).
  *
  * BENCH_r03–r05 all recorded `parsed: null`. The r05 root cause was sbt
  * itself: the forked child's stdout arrived via sbt's logger as
  * `[info] {...}` and a `[success] Total time...` banner printed AFTER the
  * JSON — both defeat the driver, which keeps the LAST 2,000 bytes of
  * combined output and json-parses the final line. build.sbt now sets
  * `outputStrategy := Some(StdoutOutput)` (unprefixed child stdio) and
  * `showSuccess := false` (no trailing banner). Only an sbt-in-the-loop
  * test can catch a regression here, so this spec spawns a REAL
  * `sbt -batch "runMain graft.BenchEmitProbe"` child — in a temp project
  * dir (same settings lines, our classes on the unmanaged classpath) to
  * avoid contending with the parent sbt's project lock — then applies the
  * driver's exact recipe to the combined output.
  */
class BenchTailParseSpec extends AnyFunSuite {

  private val repoBuild = new String(Files.readAllBytes(Paths.get("build.sbt")), UTF_8)

  // the settings lines under test — asserted present in the REAL build.sbt,
  // then copied verbatim into the temp project so the child sbt exercises them
  private val criticalLines = Seq(
    "run / fork := true",
    "outputStrategy := Some(StdoutOutput)",
    "showSuccess := false"
  )

  test("build.sbt carries the driver-tail settings") {
    criticalLines.foreach { l =>
      assert(repoBuild.contains(l), s"build.sbt lost critical line: $l")
    }
  }

  test("sbt child: last line of the 2,000-byte tail is the bare headline JSON") {
    val classesDir = Paths.get("target", "scala-2.13", "classes").toAbsolutePath
    assert(Files.exists(classesDir), s"missing $classesDir (compile first)")

    val dir = Files.createTempDirectory("graft_driver_sim")
    Files.createDirectories(dir.resolve("project"))
    // same sbt version as the real project (read, not hardcoded, so the
    // child boots from the same cached distribution offline)
    Files.copy(Paths.get("project", "build.properties"),
      dir.resolve("project").resolve("build.properties"))
    val tempBuild =
      s"""scalaVersion := "2.13.17"
         |name := "graft-driver-sim"
         |Runtime / unmanagedClasspath += Attributed.blank(file("$classesDir"))
         |${criticalLines.mkString("\n")}
         |Global / excludeLintKeys += showSuccess
         |""".stripMargin
    Files.write(dir.resolve("build.sbt"), tempBuild.getBytes(UTF_8))

    val sbtBin = Seq("/opt/sbt/bin/sbt").find(p => new java.io.File(p).canExecute).getOrElse("sbt")
    val pb = new ProcessBuilder(sbtBin, "-batch", "runMain graft.BenchEmitProbe")
    pb.directory(dir.toFile)
    pb.redirectErrorStream(true) // the driver's window is COMBINED output
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    assert(p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS), "sbt child timed out")
    assert(p.exitValue() == 0, s"sbt child rc=${p.exitValue()}\n${out.takeRight(1500)}")

    // the driver's recipe: keep the final 2,000 bytes, parse the last line
    val bytes = out.getBytes(UTF_8)
    val tail = new String(bytes.drop(math.max(0, bytes.length - 2000)), UTF_8)
    val lines = tail.linesIterator.filter(_.trim.nonEmpty).toSeq
    assert(lines.nonEmpty, "empty tail")
    val last = lines.last
    assert(last == BenchEmitProbe.ProbeJson,
      s"tail's last line is not the bare probe JSON:\n${tail.takeRight(400)}")
    // strict JSON parse (Jackson, same family as the driver's json.loads)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(last)
    assert(node.get("metric").asText() == "probe")
    assert(node.get("queries").get("q1").asDouble() == 0.10)
    // and the line before it must be the brace-free padding, so no earlier
    // brace-bearing fragment can confuse a tail-window parser
    assert(lines(lines.length - 2).forall(_ == '='), "padding line missing before JSON")
  }
}
