package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Source-byte hygiene lint (ADVICE r7): an embedded NUL byte once made
  * a .scala file diff as BINARY — an invisible byte class that evades
  * normal code review (the byte sat inside a string literal and changed
  * runtime behavior vs what the rendered source appeared to say). This
  * spec makes such bytes un-landable: every .scala source must be
  * strict-valid UTF-8 and must contain no control characters other
  * than '\n' and '\t' (no NUL, no '\r' — the repo is LF-only — no
  * escape/backspace/bell, no C1 range). Non-ASCII printable UTF-8 is
  * allowed; invisible format characters that can spoof review
  * (zero-width space/joiners, BOM, bidi overrides) are rejected.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources: Seq[Path] = {
    val root = Paths.get("src")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq
  }

  private val bannedFormatChars: Set[Int] = Set(
    0xFEFF, // BOM / zero-width no-break space
    0x200B, 0x200C, 0x200D, // zero-width space / non-joiner / joiner
    0x2060, // word joiner
    0x202A, 0x202B, 0x202C, 0x202D, 0x202E, // bidi embedding/override
    0x2066, 0x2067, 0x2068, 0x2069 // bidi isolates
  )

  test("every .scala source is strict UTF-8 with no hidden control bytes") {
    val sources = scalaSources
    assert(sources.nonEmpty, "no .scala sources found under src/ — wrong cwd?")
    val offenders = sources.flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val decoder = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val decoded =
        try Right(decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
        catch { case _: CharacterCodingException => Left("not valid UTF-8") }
      decoded match {
        case Left(msg) => Seq(s"$p: $msg")
        case Right(txt) =>
          txt.iterator.zipWithIndex.collect {
            case (c, i) if c < 0x20 && c != '\n' && c != '\t' =>
              s"$p: control byte U+${"%04X".format(c.toInt)} at char $i"
            case (c, i) if c >= 0x7F && c <= 0x9F =>
              s"$p: C1 control U+${"%04X".format(c.toInt)} at char $i"
            case (c, i) if bannedFormatChars.contains(c.toInt) =>
              s"$p: invisible format char U+${"%04X".format(c.toInt)} at char $i"
          }.take(3).toSeq
      }
    }
    assert(offenders.isEmpty,
      "non-printable/non-UTF8 bytes in sources:\n" + offenders.mkString("\n"))
  }
}
