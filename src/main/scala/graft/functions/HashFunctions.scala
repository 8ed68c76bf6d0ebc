package graft.functions

import java.security.MessageDigest

/** Driver-side hashing utilities (reference `util.py:24-80`):
  * canonical-value hashing used for run ids and numerical hashes. */
object HashFunctions {

  /** Canonical rendering of nested values: maps sorted by key,
    * sequences element-wise, scalars via toString — the moral
    * equivalent of `sort_recursive` + `convert_to_consistent_value`
    * (`util.py:24-63`). */
  def canonicalize(v: Any): String = v match {
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => (k.toString, canonicalize(x)) }
        .sortBy(_._1)
        .map { case (k, x) => s""""$k":$x""" }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(canonicalize).mkString("[", ",", "]")
    case null => "null"
    case other => s""""${other.toString}""""
  }

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** F4 `extract_data_hash` (`util.py:66-73`): 5-hex-char run id. */
  def dataHash(args: Map[String, Any]): String =
    md5Hex(canonicalize(args)).take(5)

  /** F5 `extract_numerical_hash` (`util.py:76-80`): md5 as BigInt. */
  def numericalHash(s: String): BigInt = BigInt(md5Hex(s), 16)

  /** F25 timestamped export dir name (`vdb_export_cls.py:30-32`). */
  def exportDirName(args: Map[String, Any], at: java.time.LocalDateTime): String = {
    val ts = at.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    s"vdf_${ts}_${dataHash(args)}"
  }

  /** F23 `expand_shorthand_path` (`util.py:141-156`): ~ / . / ..
    * resolution on the driver. */
  def expandShorthandPath(p: String): String = {
    val home = System.getProperty("user.home")
    val expanded =
      if (p == "~") home
      else if (p.startsWith("~/")) home + p.substring(1)
      else p
    java.nio.file.Paths.get(expanded).toAbsolutePath.normalize.toString
  }

  /** F26 semver-ish comparison (`vdf_import_cls.py:95-107`): true when
    * `a` is newer than `b`. Numeric segment-wise compare. */
  def versionNewer(a: String, b: String): Boolean = {
    def parts(v: String) = v.split("[.-]").map(s =>
      s.takeWhile(_.isDigit)).map(s => if (s.isEmpty) 0 else s.toInt)
    val (pa, pb) = (parts(a), parts(b))
    val n = math.max(pa.length, pb.length)
    (0 until n).iterator.map { i =>
      val (x, y) = (pa.lift(i).getOrElse(0), pb.lift(i).getOrElse(0))
      java.lang.Integer.compare(x, y)
    }.find(_ != 0).exists(_ > 0)
  }
}
