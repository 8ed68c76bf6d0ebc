package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The offline halves of the HF integration (S5/A2/K13) against a
  * fixture tree shaped like a real HF dataset repo:
  * `data/{split}-{NNNNN}-of-{MMMMM}.parquet` shards + extra files. */
class HfDatasetSpec extends SparkSpec {

  private def mkTree(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("hfds").toString
    Files.createDirectories(Paths.get(s"$root/data"))
    // train: two shards WITH the id column
    (0 until 30).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1).write.parquet(s"$root/tmp_tr")
    val tr = Files.list(Paths.get(s"$root/tmp_tr")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    Files.copy(Paths.get(tr.head),
      Paths.get(s"$root/data/train-00000-of-00002.parquet"))
    (30 until 50).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1).write.parquet(s"$root/tmp_tr2")
    val tr2 = Files.list(Paths.get(s"$root/tmp_tr2")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    Files.copy(Paths.get(tr2.head),
      Paths.get(s"$root/data/train-00001-of-00002.parquet"))
    // test split: WITHOUT the id column (must be skipped with a report)
    (0 until 10).map(i => s"x$i").toDF("text")
      .coalesce(1).write.parquet(s"$root/tmp_te")
    val te = Files.list(Paths.get(s"$root/tmp_te")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    Files.copy(Paths.get(te.head),
      Paths.get(s"$root/data/test-00000-of-00001.parquet"))
    root
  }

  test("shard naming: split parse and train-first ordering") {
    assert(HfDataset.splitOfShard("train-00000-of-00002.parquet")
      .contains("train"))
    assert(HfDataset.splitOfShard("validation-00007-of-00010.parquet")
      .contains("validation"))
    assert(HfDataset.splitOfShard("documents.parquet").isEmpty)
    val root = mkTree()
    val sp = HfDataset.splits(s"$root/data")
    assert(sp.map(_._1) == Seq("train", "test"))
    assert(sp.head._2.size == 2)
  }

  test("scan reads every shard; scanSplits caps across splits and skips id-less ones") {
    val root = mkTree()
    // uncapped glob path reads train's 50 rows (schema differs across
    // splits, so point it at the train shards like the reference's
    // data_path scoping)
    assert(HfDataset.scan(spark, s"$root/data").count() >= 50)
    // capped path: 40 of train's 50; the cap fills before the test
    // split is visited, so no skip is reported — the reference's loop
    // breaks the same way before reaching later splits
    val (df, skipped) = HfDataset.scanSplits(spark, s"$root/data",
      idColumn = "id", maxNumRows = 40)
    assert(df.count() == 40)
    assert(df.select("split").distinct().collect().map(_.getString(0)).toSeq
      == Seq("train"))
    assert(skipped.isEmpty)
    // cap larger than the eligible corpus: everything eligible, and
    // the visited id-less split IS reported skipped
    val (all, skipped2) = HfDataset.scanSplits(spark, s"$root/data",
      idColumn = "id", maxNumRows = 1000)
    assert(all.count() == 50)
    assert(skipped2.map(_.split) == Seq("test"))
  }

  test("countRowsMetadata equals the scan count without reading column data") {
    val root = mkTree()
    assert(HfDataset.countRowsMetadata(spark, s"$root/data") == 60)
    // single-file form
    val one = Files.list(Paths.get(s"$root/data")).toArray.map(_.toString)
      .filter(_.contains("train-00000")).head
    assert(HfDataset.countRowsMetadata(spark, one) == 30)
  }

  test("stageForPush: naming, card, and recursive upload plan") {
    val root = mkTree()
    // named: vdf_ prefix; repo id under the user
    val plan = HfDataset.stageForPush(s"$root/data", Some("my-vecs"), "alice")
    assert(plan.repoId == "alice/vdf_my-vecs" && plan.isPrivate)
    assert(plan.datasetUrl.endsWith("datasets/alice/vdf_my-vecs"))
    // the card landed in the staged dir with the reference's tag block
    val card = Files.readString(Paths.get(s"$root/data/README.md"))
    assert(card.contains("- vector-io") && card.contains("- vdf"))
    assert(plan.files.contains("README.md") &&
      plan.files.contains("train-00000-of-00002.parquet"))
    // unnamed: directory basename; --public flips privacy
    val plan2 = HfDataset.stageForPush(s"$root/data", None, "bob",
      public = true)
    assert(plan2.repoId == "bob/data" && !plan2.isPrivate)
  }
}
