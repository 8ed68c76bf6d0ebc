package graft.io

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The offline halves of the reference's HuggingFace dataset
  * integration (S5 / A2 / K13). The network endpoints (datasets-server
  * REST, HfFileSystem, HfApi) are unreachable from this environment;
  * everything below operates on the SAME repo tree those endpoints
  * expose — a directory of parquet shards named by the public HF
  * convention `{split}-{NNNNN}-of-{MMMMM}.parquet` (usually under
  * `data/`), plus a README.md dataset card — so a caller with network
  * access only swaps the directory for an `hf://` mount.
  *
  *  - [[listShards]]/[[scan]]: the recursive `*.parquet` glob read
  *    path over `datasets/{name}` (`util.py:333-341` get_parquet_files).
  *  - [[scanSplits]]: the `max_num_rows` path (`util.py:289-331`):
  *    per-split iteration in declaration order, rows taken up to the
  *    cross-split cap, and splits MISSING the id column skipped with a
  *    report instead of failing (`util.py:315-325`).
  *  - [[countRowsMetadata]]: the datasets-server `/size` num_rows
  *    (`scripts/count_rows_hf.py:5-17`) computed from parquet FOOTER
  *    metadata only — no column data is read; footer reads shard
  *    across executors, so the count of a 100 TB corpus costs one
  *    small read per file.
  *  - [[stageForPush]]: the local half of push-to-hub
  *    (`scripts/push_to_hub_vdf.py:9-78`): repo-id synthesis
  *    (`vdf_` prefix / basename fallback, '/'→'_'), the dataset card
  *    with the reference's exact tag block, and the upload plan
  *    (upload_folder is recursive, so the plan lists every file).
  */
object HfDataset {

  private val ShardName = """(.+)-(\d{5})-of-(\d{5})\.parquet""".r

  /** Split name encoded in a shard file name, if the name follows the
    * HF convention; `train-00000-of-00002.parquet` → `train`. */
  def splitOfShard(fileName: String): Option[String] = fileName match {
    case ShardName(split, _, _) => Some(split)
    case _ => None
  }

  /** Every parquet shard under the dataset root, recursively — the
    * `**.parquet` glob of the HfFileSystem read path. Deterministic
    * (sorted) so downstream split iteration is reproducible. */
  def listShards(root: String): Seq[Path] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Seq.empty
    val s = Files.walk(r)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  /** The uncapped read path: one frame over every shard (the reference
    * hands the full glob list to its loader). */
  def scan(spark: SparkSession, root: String): DataFrame = {
    val shards = listShards(root)
    require(shards.nonEmpty, s"no parquet shards under $root")
    spark.read.parquet(shards.map(_.toString): _*)
  }

  /** Shards grouped by split, `train` first then alphabetical —
    * locally there is no splits API, so order is the convention's:
    * the primary split leads (`list_configs_and_splits` yields
    * ("train", None) exactly when the API is unreachable,
    * `util.py:265-268`). Shards whose names don't follow the split
    * convention land in "train". */
  def splits(root: String): Seq[(String, Seq[Path])] =
    listShards(root)
      .groupBy(p => splitOfShard(p.getFileName.toString).getOrElse("train"))
      .toSeq
      .sortBy { case (split, _) => (split != "train", split) }

  /** One row per skipped split, mirroring the reference's tqdm report. */
  final case class SkippedSplit(split: String, reason: String)

  /** The capped, id-checked read path (`util.py:289-331`): iterate
    * splits in order, take rows until `maxNumRows` is reached across
    * splits, and SKIP (with a report) any split lacking `idColumn` —
    * the reference removes those rows rather than failing the export.
    * Output carries a `split` column. The per-split driver loop is
    * bounded by the number of splits (single digits for real datasets),
    * and each split's rows are taken with a limit — never collected. */
  def scanSplits(spark: SparkSession, root: String, idColumn: String,
      maxNumRows: Int): (DataFrame, Seq[SkippedSplit]) = {
    require(maxNumRows > 0, "maxNumRows must be positive")
    var remaining = maxNumRows.toLong
    val skipped = Seq.newBuilder[SkippedSplit]
    val parts = Seq.newBuilder[DataFrame]
    splits(root).foreach { case (split, shards) =>
      if (remaining > 0) {
        val df = spark.read.parquet(shards.map(_.toString): _*)
        if (!df.columns.contains(idColumn)) {
          skipped += SkippedSplit(split,
            s"ID column '$idColumn' not found; skipping split '$split'")
        } else {
          val take = df.limit(math.min(remaining, Int.MaxValue).toInt)
            .withColumn("split", lit(split))
          val n = take.count()
          remaining -= n
          parts += take
        }
      }
    }
    val frames = parts.result()
    require(frames.nonEmpty, s"no split under $root carries '$idColumn'")
    (VdfIO.unionWithSchemaMerge(frames), skipped.result())
  }

  /** Exact row count from parquet footer metadata only — the
    * datasets-server `/size` num_rows, computed without touching
    * column data. Footer reads are distributed: one task per shard
    * batch, each opening only the file tail. `path` may be a single
    * parquet file or a directory of shards. */
  def countRowsMetadata(spark: SparkSession, path: String): Long = {
    val p = Paths.get(path)
    val files: Seq[String] =
      if (Files.isRegularFile(p)) Seq(path)
      else listShards(path).map(_.toString)
    require(files.nonEmpty, s"no parquet under $path")
    spark.sparkContext
      .parallelize(files, math.min(files.size, 64))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
      .sum().toLong
  }

  /** The push plan: what `upload_folder` + `upload_file` would send. */
  final case class HfPushPlan(repoId: String, datasetUrl: String,
      isPrivate: Boolean, files: Seq[String])

  /** Dataset-card body — the reference's exact tag block
    * (`push_to_hub_vdf.py:57-70`). */
  val DatasetCard: String =
    """
      |---
      |tags:
      |- vdf
      |- vector-io
      |- vector-dataset
      |- vector-embeddings
      |---
      |This is a dataset created using [vector-io](https://github.com/ai-northstar-tech/vector-io)
      |""".stripMargin

  /** Local half of push-to-hub (`push_to_hub_vdf.py:36-55`): repo name
    * = `vdf_<name>` when a name is given, else the directory basename
    * with '/'→'_'; repo id = `<username>/<name>`; the card is written
    * INTO the staged directory (the reference writes README.md into
    * the export dir and uploads it); the returned plan lists every
    * file `upload_folder` would push, repo-relative. Private by
    * default, exactly like the reference's `--public` flag. */
  def stageForPush(vdfDir: String, name: Option[String], username: String,
      public: Boolean = false): HfPushPlan = {
    val base = Paths.get(vdfDir)
    require(Files.isDirectory(base), s"not a directory: $vdfDir")
    val repoName = name.map("vdf_" + _)
      .getOrElse(base.getFileName.toString.replace("/", "_"))
    val repoId = s"$username/$repoName"
    Files.writeString(base.resolve("README.md"), DatasetCard)
    val s = Files.walk(base)
    val files =
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => base.relativize(p).toString).toSeq.sorted
      finally s.close()
    HfPushPlan(repoId, s"https://huggingface.co/datasets/$repoId",
      isPrivate = !public, files = files)
  }
}
