package graft.cli

/** Tiny main run UNDER A REAL PTY by CliPromptSpec (via script(1)):
  * asserts the JVM sees a terminal, then exercises the real
  * `Prompts.ConsoleIO` readLine path — the part no scripted-IO test
  * can reach. Prints parseable markers instead of assertions because
  * it runs in a child JVM. */
object PtyProbe {
  def main(args: Array[String]): Unit = {
    println(s"PTY_CONSOLE=${System.console() != null}")
    val flags = Prompts.setArgFromInput(Map.empty,
      Prompts.Ask("dir", "Enter the VDF dataset directory: "),
      Prompts.ConsoleIO)
    println(s"PTY_DIR=${flags.getOrElse("dir", "<unset>")}")
  }
}
