package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** The version console scripts (`setup.py:21-22`): bump semantics with
  * the reference's reset rules, the MAJOR.MINOR-only update nag
  * (`check_for_updates.py:13-17`), and the CLI wrappers end to end on
  * a real file. */
class VersioningSpec extends AnyFunSuite {

  private val sbtContent =
    """ThisBuild / scalaVersion := "2.13.17"
      |ThisBuild / version := "1.4.9"
      |name := "x"
      |""".stripMargin

  test("bump patch/minor/major with reset rules") {
    val Right((_, o1, n1)) = Versioning.bump(sbtContent, "patch")
    assert(o1 == "1.4.9" && n1 == "1.4.10")
    val Right((_, _, n2)) = Versioning.bump(sbtContent, "minor")
    assert(n2 == "1.5.0")
    val Right((c3, _, n3)) = Versioning.bump(sbtContent, "major")
    assert(n3 == "2.0.0")
    assert(c3.contains("version := \"2.0.0\""))
    // only the version line changes
    assert(c3.contains("scalaVersion := \"2.13.17\""))
    assert(Versioning.bump(sbtContent, "banana").isLeft)
    assert(Versioning.bump("name := \"x\"", "patch").isLeft)
  }

  test("update nag compares MAJOR.MINOR only (check_for_updates.py:13-17)") {
    // patch behind: silent
    assert(Versioning.updateMessage("1.4.9", "1.4.12").isEmpty)
    // minor behind: nag
    assert(Versioning.updateMessage("1.4.9", "1.5.0").nonEmpty)
    // major behind: nag
    assert(Versioning.updateMessage("1.9.0", "2.0.0").nonEmpty)
    // up to date / ahead: silent
    assert(Versioning.updateMessage("2.0.0", "1.9.9").isEmpty)
    assert(Versioning.updateMessage("1.5.0", "1.5.0").isEmpty)
  }

  test("CLI wrappers rewrite a real file and respect the silent-no-source rule") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val f = java.nio.file.Files.createTempFile("build", ".sbt")
    java.nio.file.Files.writeString(f, sbtContent)
    assert(Cli.run(spark,
      Seq("bump-version", "--file", f.toString, "--part", "minor")) == 0)
    assert(java.nio.file.Files.readString(f).contains("\"1.5.0\""))
    assert(Cli.run(spark,
      Seq("bump-version", "--file", "/nope/x.sbt")) == 2)
    assert(Cli.run(spark, Seq("version-check",
      "--current", "1.4.0", "--latest", "1.5.0")) == 0)
    assert(Cli.run(spark, Seq("version-check", "--current", "1.4.0")) == 0)
  }
}
