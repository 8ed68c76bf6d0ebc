package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Golden-help tests: the CLI surface is frozen in the transcripts
  * under `docs/cli/` exactly like the reference freezes its ten
  * `docs/export_vdf_..._help.txt` files — a CLI change must come with
  * an explicit golden update (SURVEY §5 item 5). */
class CliHelpSpec extends AnyFunSuite {
  private val goldenDir = java.nio.file.Paths.get("docs/cli")

  private def golden(name: String): String =
    java.nio.file.Files.readString(goldenDir.resolve(name))

  test("global help matches its golden transcript") {
    assert(Cli.helpText("") + "\n" == golden("graft_help.txt"))
  }

  Cli.commands.foreach { cmd =>
    test(s"'$cmd' help matches docs/cli/graft_${cmd}_help.txt") {
      assert(Cli.helpText(cmd) + "\n" == golden(s"graft_${cmd}_help.txt"))
    }
  }

  test("every command documented in the global help has a golden") {
    Cli.commands.foreach { cmd =>
      assert(golden("graft_help.txt").contains(cmd),
        s"global help must mention $cmd")
      assert(java.nio.file.Files.exists(
        goldenDir.resolve(s"graft_${cmd}_help.txt")))
    }
  }

  test("help command paths return 0 and print without a SparkSession") {
    // run() only touches Spark inside command bodies; help short-circuits
    assert(Cli.run(null, Seq("help")) == 0)
    assert(Cli.run(null, Seq("help", "export")) == 0)
    assert(Cli.run(null, Seq("dedup", "--help")) == 0)
  }
}
