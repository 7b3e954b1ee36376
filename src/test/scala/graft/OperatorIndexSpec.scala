package graft

import org.scalatest.funsuite.AnyFunSuite

/** The checked-in OPERATORS.md must be exactly what the catalog generates —
  * a stale index is a broken promise to users browsing the repo.
  */
class OperatorIndexSpec extends AnyFunSuite {

  test("OPERATORS.md is in sync with Catalog (regenerate: sbt 'runMain graft.OperatorIndex')") {
    val onDisk = java.nio.file.Files.readString(java.nio.file.Paths.get("OPERATORS.md"))
    assert(onDisk == OperatorIndex.render)
  }

  test("every catalog query appears exactly once in the rendered index") {
    val rendered = OperatorIndex.render
    Catalog.all.keys.foreach { name =>
      val occurrences = s"(?m)^\\| `${java.util.regex.Pattern.quote(name)}` \\|".r
        .findAllMatchIn(rendered).size
      assert(occurrences == 1, s"$name appears $occurrences times")
    }
  }
}
