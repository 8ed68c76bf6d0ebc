package graft.cli

/** Interactive argument completion — the rebuild of the reference's
  * `set_arg_from_input` / `set_arg_from_password` (`util.py:83-138`),
  * woven through every reference connector and deliberately kept in
  * the CLI layer: the engine core never blocks on a terminal.
  *
  * Reference semantics preserved exactly:
  *  - a missing default falls back to the arg's environment variable
  *    when one is declared and set;
  *  - a default of `"DO_NOT_PROMPT"` suppresses the prompt entirely;
  *  - surrounding matched quotes are stripped from the input
  *    (`util.py:109-113`);
  *  - empty input accepts the default (or leaves the arg unset when
  *    there is none);
  *  - with `choices`, every comma-separated item must be a valid
  *    choice or the prompt loops with
  *    `Invalid input. Please choose from ...`;
  *  - passwords read from the declared env var first, else via the
  *    terminal's no-echo reader (`getpass` ↔ `Console.readPassword`).
  *
  * Prompting activates only when a terminal is attached
  * (`System.console() != null`) or `GRAFT_INTERACTIVE=1` forces it —
  * batch/headless runs keep today's fail-fast behavior. */
object Prompts {

  /** Terminal abstraction so specs drive the loop with scripted
    * input and capture the exact transcript. */
  trait IO {
    def readLine(prompt: String): String
    def readPassword(prompt: String): String
    def println(s: String): Unit
  }

  /** The real terminal. Falls back to plain stdin when the JVM has no
    * `Console` (e.g. piped stdin under GRAFT_INTERACTIVE=1). */
  object ConsoleIO extends IO {
    override def readLine(prompt: String): String = {
      val c = System.console()
      if (c != null) Option(c.readLine("%s", prompt)).getOrElse("")
      else {
        Console.print(prompt); Console.flush()
        Option(scala.io.StdIn.readLine()).getOrElse("")
      }
    }
    override def readPassword(prompt: String): String = {
      val c = System.console()
      if (c != null)
        Option(c.readPassword("%s", prompt)).map(new String(_)).getOrElse("")
      else readLine(prompt)
    }
    override def println(s: String): Unit = Console.println(s)
  }

  /** One prompted argument. `envVar` supplies the default (input) or
    * the value itself (password), like the reference's `env_var` /
    * `env_var_name` parameters. */
  final case class Ask(arg: String, prompt: String,
      default: Option[String] = None,
      choices: Option[Seq[String]] = None,
      envVar: Option[String] = None,
      password: Boolean = false)

  def interactive: Boolean =
    System.console() != null || sys.env.get("GRAFT_INTERACTIVE").contains("1")

  /** `set_arg_from_input` (`util.py:83-126`). Returns the flags with
    * the arg filled (or unchanged when already present / suppressed). */
  def setArgFromInput(flags: Map[String, String], ask: Ask, io: IO,
      env: String => Option[String] = sys.env.get): Map[String, String] = {
    val default = ask.default.orElse(ask.envVar.flatMap(env))
    if (flags.contains(ask.arg) || default.contains("DO_NOT_PROMPT"))
      return flags
    val suffix = ask.choices.map(c => " " + c.mkString("[", ", ", "]") + ": ")
      .getOrElse("")
    while (true) {
      var inp = io.readLine(ask.prompt + suffix)
      if (inp.length >= 2 &&
          ((inp.head == '"' && inp.last == '"') ||
            (inp.head == '\'' && inp.last == '\'')))
        inp = inp.substring(1, inp.length - 1)
      if (inp.isEmpty)
        return default.map(d => flags + (ask.arg -> d)).getOrElse(flags)
      else if (ask.choices.exists(cs => !inp.split(",").forall(cs.contains)))
        io.println(s"Invalid input. Please choose from " +
          ask.choices.get.mkString("[", ", ", "]"))
      else
        return flags + (ask.arg -> inp)
    }
    flags // unreachable
  }

  /** `set_arg_from_password` (`util.py:130-138`): env var wins, else
    * the no-echo terminal read. */
  def setArgFromPassword(flags: Map[String, String], ask: Ask, io: IO,
      env: String => Option[String] = sys.env.get): Map[String, String] =
    ask.envVar.flatMap(env) match {
      case Some(v) => flags + (ask.arg -> v)
      case None =>
        if (flags.contains(ask.arg)) flags
        else flags + (ask.arg -> io.readPassword(ask.prompt))
    }

  /** Fill every missing asked arg in order. */
  def fill(flags: Map[String, String], asks: Seq[Ask], io: IO,
      env: String => Option[String] = sys.env.get): Map[String, String] =
    asks.foldLeft(flags) { (f, a) =>
      if (a.password) setArgFromPassword(f, a, io, env)
      else setArgFromInput(f, a, io, env)
    }
}
