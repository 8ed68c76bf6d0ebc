package graft.tools

/** Regenerate the CLI golden-help transcripts under docs/cli/ after an
  * intentional CLI surface change — the explicit step CliHelpSpec's
  * golden diffs exist to force. Usage:
  * tools/run_main.sh graft.tools.GenCliHelp [cmd ...] (default: all).
  */
object GenCliHelp {
  def main(args: Array[String]): Unit = {
    val cmds = if (args.nonEmpty) args.toSeq else "" +: graft.cli.Cli.commands
    for (c <- cmds) {
      val name = if (c.isEmpty) "graft_help.txt" else s"graft_${c}_help.txt"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"docs/cli/$name"),
        graft.cli.Cli.helpText(c) + "\n")
      println(s"wrote docs/cli/$name")
    }
  }
}
