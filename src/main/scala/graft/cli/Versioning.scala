package graft.cli

/** The reference's two version console scripts
  * (`setup.py:21-22` → `scripts/bump_version.py`,
  * `scripts/check_for_updates.py`), rebuilt for the sbt layout:
  *
  *  - `bump`: find `version := "x.y.z"` (or `version = "x.y.z"`) in a
  *    build file, bump the requested part with the reference's reset
  *    rules (major bump zeroes minor+patch, minor bump zeroes patch),
  *    rewrite in place.
  *  - `updateMessage`: the reference compares only the MAJOR.MINOR
  *    prefix (`current_version.release[:2] < latest_version.release[:2]`,
  *    `check_for_updates.py:13-17`) and prints an upgrade hint; patch
  *    releases never nag. The PyPI fetch is out-of-env (zero egress);
  *    the latest version arrives via `--latest` / `GRAFT_LATEST_VERSION`
  *    instead, and with no source at all the check is silent — the
  *    same behavior the reference has when its HTTP request fails. */
object Versioning {

  private val VersionRe =
    """(version\s*:?=\s*["'])([^"']+)(["'])""".r

  /** Parse `x.y.z...` → numeric segments (non-numeric tails dropped,
    * like pkg_resources' release tuple). */
  def release(v: String): Seq[Int] =
    v.split("[.\\-]").toSeq.map(_.takeWhile(_.isDigit))
      .map(s => if (s.isEmpty) 0 else s.toInt)

  /** Bump `part` in the FIRST version assignment found; returns
    * (new content, old version, new version). */
  def bump(content: String, part: String): Either[String, (String, String, String)] =
    VersionRe.findFirstMatchIn(content) match {
      case None => Left("version assignment not found " +
        "(expected version := \"x.y.z\")")
      case Some(m) =>
        val old = m.group(2)
        release(old) match {
          case Seq(maj, min, pat, _*) =>
            val next = part match {
              case "major" => s"${maj + 1}.0.0"
              case "minor" => s"$maj.${min + 1}.0"
              case "patch" => s"$maj.$min.${pat + 1}"
              case other => return Left(
                s"invalid part '$other' (major|minor|patch)")
            }
            Right((content.substring(0, m.start) +
              m.group(1) + next + m.group(3) +
              content.substring(m.end), old, next))
          case _ => Left(s"version '$old' is not x.y.z")
        }
    }

  /** The reference's update nag, or None when current is new enough.
    * MAJOR.MINOR compare only (`check_for_updates.py:13-17`). */
  def updateMessage(current: String, latest: String): Option[String] = {
    val (c, l) = (release(current).padTo(2, 0).take(2),
      release(latest).padTo(2, 0).take(2))
    val older = c.zip(l).iterator.map { case (a, b) =>
      java.lang.Integer.compare(a, b)
    }.find(_ != 0).exists(_ < 0)
    if (older)
      Some(s"Current version: $current. Update available: $latest. " +
        "Pull the latest release to update.")
    else None
  }
}
