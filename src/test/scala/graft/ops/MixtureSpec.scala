package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Library-level invariants for ops/Mixture. The resample/epochs/
  * tokenBudget kernels are primarily gated by the DuckDB hash-match on
  * q_mixture_sample / q_mixture_epochs / q_token_budget (all three
  * SFs + 1.4 GiB); this spec covers what the queries can't see —
  * schema preservation, the diagnostics flag, and the sharded
  * training-order writer. */
class MixtureSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 300L).map(i => (i, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
  }

  test("resample preserves the input schema; diagnostics adds weight/n_total") {
    val w = when(col("source") === "src0", 1).otherwise(2)
    val plain = Mixture.resample(docs, "source", "doc_id", w)
    assert(plain.columns.toSeq == Seq("doc_id", "source", "text"))
    val diag = Mixture.resample(docs, "source", "doc_id", w,
      keepDiagnostics = true)
    assert(diag.columns.toSeq ==
      Seq("doc_id", "source", "text", "weight", "n_total"))
    // weight-0/null sources are dropped entirely
    val zero = Mixture.resample(docs, "source", "doc_id",
      when(col("source") === "src0", 0).otherwise(1))
    assert(zero.filter(col("source") === "src0").count() == 0)
    assert(zero.count() > 0)
  }

  test("resample treats a NULL source as a real group (null-safe counts join)") {
    import spark.implicits._
    val d = (0L until 200L)
      .map(i => (i, if (i % 2 == 0) null else "srcA", s"text $i"))
      .toDF("doc_id", "source", "text")
    // equal weights: both groups have 100 rows, so every row survives —
    // if the counts join were a plain equi-join, all null-source rows
    // would silently vanish instead
    val out = Mixture.resample(d, "source", "doc_id", lit(1))
    assert(out.filter(col("source").isNull).count() == 100L)
    assert(out.count() == 200L)
    // and the keep RULE applies to the null group like any other:
    // weight 1 vs 2 halves it (rate w_m*n_s/(w_s*n_m) in expectation)
    val skew = Mixture.resample(d, "source", "doc_id",
      when(col("source").isNull, 1).otherwise(2))
    val nullKept = skew.filter(col("source").isNull).count()
    assert(nullKept > 0 && nullKept < 100,
      s"null group should downsample, kept $nullKept/100")
  }

  test("tokenBudgetSalted is row-identical to the exact greedy prefix") {
    import spark.implicits._
    // several seeds × shapes: uniform sources, a heavily skewed source,
    // a null source, zero-token and null-token rows, and budgets that
    // land exactly on a cumulative boundary
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 4000).map { i =>
        val src =
          if (i % 97 == 0) null
          else if (rnd.nextInt(10) < 7) "big" // ~70% skew into one source
          else s"s${rnd.nextInt(4)}"
        val toks: java.lang.Long =
          if (rnd.nextInt(50) == 0) null
          else if (rnd.nextInt(20) == 0) 0L
          else rnd.nextInt(40).toLong
        // a few NULL ids: their md5 key and bucket are null, the exact
        // kernel sorts them first — the salted bucket join must be
        // null-safe (<=>) or these rows silently vanish (ADVICE r7)
        val docId = if (i % 499 == 7) null else s"doc-$seed-$i"
        (docId, src, toks)
      }
      val d = rows.toDF("doc_id", "source", "toks")
        // per-source budget incl. one tuned to sit near real cum values
        .withColumn("budget",
          when(col("source") === "big", 2000L)
            .when(col("source").isNull, 150L).otherwise(300L))
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").collect().map(_.getString(0)).toSet
      val exact = ids(Mixture.tokenBudget(
        d, "source", "doc_id", col("toks"), col("budget")))
      val salted = ids(Mixture.tokenBudgetSalted(
        d, "source", "doc_id", col("toks"), col("budget")))
      assert(salted == exact,
        s"seed $seed: salted minus exact = ${(salted -- exact).take(5)}, " +
          s"exact minus salted = ${(exact -- salted).take(5)}")
      assert(exact.nonEmpty)
    }
  }

  test("temperature law: kept set is exactly the sqrt-derived integer rule; rarest source kept whole") {
    import spark.implicits._
    // skewed corpus incl. a null-source group; sizes chosen so the
    // n/w ratios are pairwise distinct (no struct tie-break in play)
    val sizes: Map[String, Int] =
      Map("big" -> 400, "mid" -> 150, "small" -> 60, "tiny" -> 25)
    val rows = sizes.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s-$i", s))
    } ++ (0 until 40).map(i => (s"orphan-$i", null: String))
    val df = rows.toDF("doc_id", "source")
    val out = Mixture.temperature(df, "source", "doc_id", alpha = 0.5,
      keepDiagnostics = true)
    assert(out.columns.toSeq ==
      Seq("doc_id", "source", "weight", "n_total"))
    val kept = out.select("doc_id").collect().map(_.getString(0)).toSet
    // in-memory oracle: the documented arithmetic, step for step
    val counts: Map[Option[String], Long] =
      sizes.map { case (k, v) => Option(k) -> v.toLong } +
        (Option.empty[String] -> 40L)
    val nMax = counts.values.max.toDouble
    def w(s: Option[String]): Long = math.max(1L,
      math.round(1024.0 * math.sqrt(counts(s).toDouble) / math.sqrt(nMax)))
    val limiting = counts.keys.minBy(s => counts(s).toDouble / w(s))
    val (nM, wM) = (counts(limiting), w(limiting))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: String): Long = {
      md.reset(); (md.digest(id.getBytes("UTF-8"))(15) & 0xff).toLong
    }
    val expect = rows.filter { case (id, src) =>
      val s = Option(src)
      bucket(id) * wM * counts(s) < 256L * w(s) * nM
    }.map(_._1).toSet
    assert(kept == expect,
      s"kept minus expect = ${(kept -- expect).take(5)}, " +
        s"expect minus kept = ${(expect -- kept).take(5)}")
    // the limiting (rarest) source survives whole — that's T's definition
    assert(limiting == Option("tiny"))
    assert(kept.count(_.startsWith("tiny-")) == 25)
    // and the dominant source downsamples toward its sqrt share
    // (target rate here is exactly 0.25: T·w_big/n_big = (25/256)·1024/400)
    val bigKept = kept.count(_.startsWith("big-"))
    assert(bigKept > 0 && bigKept < 200, s"big kept $bigKept of 400")
    // null-source rows resample like any other group, not vanish
    assert(kept.exists(_.startsWith("orphan-")))
  }

  test("temperature plan: keep filter is map-side under a broadcast join — the corpus is never exchanged") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (s"d$i", s"s${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val plan = Mixture.temperature(d, "source", "doc_id", alpha = 0.5)
      .queryExecution.executedPlan.toString
    // the corpus side attaches via BroadcastHashJoin (the ~|sources|-row
    // counts/weights table is the build side) ...
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // ... and every Exchange in the plan belongs to the tiny counts
    // aggregate (partial-agg shuffle + the all-rows window's single
    // partition) — 2 exchanges total, neither carrying corpus rows,
    // which is the documented scan -> filter -> write shape at 100 TB
    val exchanges = "Exchange".r.findAllIn(
      plan.replace("BroadcastExchange", "BX")).length
    assert(exchanges <= 2, s"corpus-scale exchange leaked into the plan:\n$plan")
  }

  test("temperature alpha=1 with proportional counts is the identity mixture; bad args rejected") {
    import spark.implicits._
    // counts 100/200/400 make every weight exactly proportional
    // (w = 256/512/1024), so all n/w ratios coincide and the keep rule
    // degenerates to bucket < 256 — everything kept, whichever source
    // the tie-break picks as limiting
    val d = (Seq.fill(100)("a") ++ Seq.fill(200)("b") ++ Seq.fill(400)("c"))
      .zipWithIndex.map { case (s, i) => (s"$s-$i", s) }
      .toDF("doc_id", "source")
    assert(Mixture.temperature(d, "source", "doc_id", alpha = 1.0)
      .count() == 700L)
    intercept[IllegalArgumentException] {
      Mixture.temperature(d, "source", "doc_id", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Mixture.temperature(d, "source", "doc_id", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Mixture.temperature(d, "source", "doc_id", alpha = 0.5,
        resolution = 1000) // not a power of two
    }
  }

  test("epochs appends a 1-based rep column and keeps every doc at least once") {
    val e = Mixture.epochs(docs, "doc_id",
      when(col("source") === "src0", 512L).otherwise(256L))
    assert(e.columns.toSeq == Seq("doc_id", "source", "text", "rep"))
    assert(e.groupBy("doc_id").count().filter(col("count") < 1).count() == 0)
    assert(e.agg(min("rep")).head.getLong(0) == 1L)
    // exactly 2 reps for the 2.0-epoch source, 1 for the rest
    assert(e.filter(col("source") === "src0").groupBy("doc_id").count()
      .filter(col("count") =!= 2).count() == 0)
  }

  test("epochs below 1.0 DOWNSAMPLES: reps=0 emits zero rows, never phantom [1,0]") {
    // e256=128 → 0.5 epochs: docs with bucket >= 128 get reps=0 and
    // must vanish (a bare sequence(1, 0) would emit Spark's DESCENDING
    // two-row [1, 0] — the bug this guards)
    val e = Mixture.epochs(docs, "doc_id", lit(128L))
    val perDoc = e.groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
    assert(perDoc == Set(1L), s"per-doc rep counts: $perDoc")
    assert(e.agg(min("rep")).head.getLong(0) == 1L, "rep=0 leaked out")
    val total = e.count().toDouble / docs.count()
    assert(total > 0.3 && total < 0.7, s"0.5-epoch rate off: $total")
  }

  test("resample law: realized per-source rate equals the integer rule exactly, any weights") {
    import spark.implicits._
    // deterministic seed sweep over random weight assignments 1..10
    (0 until 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nSrc = 2 + rnd.nextInt(5)
      val ws = Array.fill(nSrc)(1 + rnd.nextInt(10))
      val rows = (0L until 600L).map(i => (i + seed * 10000L, s"s${i % nSrc}"))
      val df = rows.toDF("doc_id", "source")
      val wCol = (0 until nSrc).foldLeft(lit(ws(0))) { (acc, j) =>
        when(col("source") === s"s$j", lit(ws(j))).otherwise(acc)
      }
      val kept = Mixture.resample(df, "source", "doc_id", wCol)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // in-memory oracle: identical integer rule over MD5 last bytes
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(id: Long) = {
        md.reset(); (md.digest(id.toString.getBytes("UTF-8"))(15) & 0xff)
      }
      val bySrc = rows.groupBy(_._2)
      val counts = bySrc.view.mapValues(_.size.toLong).toMap
      def w(s: String) = ws(s.drop(1).toInt)
      val limiting = counts.keys.minBy(s => (counts(s) * (2520 / w(s)), s))
      val (nM, wM) = (counts(limiting), w(limiting))
      val expect = bySrc.map { case (s, docs) =>
        s -> docs.count { case (id, _) =>
          bucket(id).toLong * wM * counts(s) < 256L * w(s) * nM
        }.toLong
      }.filter(_._2 > 0)
      assert(kept == expect, s"seed=$seed: $kept != $expect")
      // the limiting source is kept whole
      assert(!expect.contains(limiting) || expect(limiting) == nM)
    }
  }

  test("tokenBudget law: kept set is exactly the greedy hash-order prefix, any budgets") {
    import spark.implicits._
    (0 until 5).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val rows = (0L until 400L).map { i =>
        (i, s"s${i % 3}", rnd.nextInt(50).toLong)
      }
      val df = rows.toDF("doc_id", "source", "toks")
      val budget = 50L + rnd.nextInt(500)
      val kept = Mixture.tokenBudget(df, "source", "doc_id",
          col("toks"), lit(budget))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val hex = rows.map { case (id, _, _) =>
        id -> java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toMap
      val expect = rows.groupBy(_._2).values.flatMap { docs =>
        var cum = 0L
        docs.sortBy(d => (hex(d._1), d._1)).takeWhile { d =>
          val ok = cum + d._3 <= budget
          if (ok) cum += d._3
          ok
        }.map(_._1)
      }.toSet
      assert(kept == expect, s"seed=$seed budget=$budget")
    }
  }

  test("writeShuffledShards: file-ordered replay IS the global md5 order") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    Mixture.writeShuffledShards(docs, "doc_id", out, numShards = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    assert(back.columns.toSeq == Seq("doc_id", "source", "text"))
    // replay: files in name order, rows in file order
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath).sorted
    assert(files.length == 4)
    val replayed = files.flatMap { f =>
      spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))
    }.toSeq
    val want = docs
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(replayed == want, "sharded replay diverges from the global order")
  }
}
