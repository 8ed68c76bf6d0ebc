package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture primitives (GPT-3 Table 2.2 sampling ratios; DoReMi,
  * Xie et al. NeurIPS'23; The Pile's epochs-per-subset, Gao et al.
  * 2020): downsample sources to target weights, upsample by fractional
  * epochs, cap a source at a token budget. Every draw is a pure
  * integer function of the row id (md5 bucket 0..255), so results are
  * reproducible across runs, engines, partitionings, and cluster
  * sizes — the library half behind the oracle-gated
  * q_mixture_sample / q_mixture_epochs / q_token_budget queries, and
  * the `graft mixture` CLI.
  */
object Mixture {

  /** md5 bucket 0..255 of the id — the engine-neutral coin, as the
    * codegen'd [[graft.expressions.Md5Bucket]] (reads the one digest
    * byte instead of building and scanning the 32-char hex; value-
    * identical to the SQL idiom the DuckDB oracles use, so the
    * q_mixture_* gates hold over this exact code path). */
  def bucket(idCol: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.Md5Bucket(
      Bridge.expression(col(idCol).cast("string"))))
  }

  /** The deterministic-order sort key: raw md5 digest of the id —
    * bit-identical ORDER to sorting by the md5 hex string (unsigned
    * binary order == hex lexicographic order), 16 fixed bytes per row
    * in the sort instead of a 32-char string. */
  def orderKey(idCol: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.Md5Binary(
      Bridge.expression(col(idCol).cast("string"))))
  }

  /** Downsample each source to target mixture weights, scaled so the
    * limiting source (min nₛ/wₛ) is kept whole: keep rate
    * wₛ·T/nₛ with T = min nₛ/wₛ. The keep decision
    * `bucket·w_m·nₛ < 256·wₛ·n_m` is pure BIGINT arithmetic — no
    * float rate anywhere. Weights are per-SOURCE: positive integers
    * dividing LCM 2520 (1..10 all qualify), intended constant within
    * a source — if the expression varies, the source's weight is its
    * MAX (the keep rule reads the per-source aggregate, never the
    * per-row value); rows whose weight expression is 0/null are
    * dropped. A null SOURCE is a legitimate group: the counts join is
    * null-safe, so null-source rows resample like any other source
    * rather than silently vanishing on the equi-join.
    *
    * Returns the KEPT rows with the input schema. Shape at 100 TB:
    * per-source counts are one tiny map-side-partial aggregate,
    * broadcast back with the 1-row limiting aggregate; the keep
    * filter itself is map-side, so a scan → resample → write pipeline
    * has NO corpus-scale exchange. */
  def resample(docs: DataFrame, sourceCol: String, idCol: String,
      weightCol: Column, keepDiagnostics: Boolean = false): DataFrame = {
    val inCols = docs.columns.toSeq
    val d = docs.withColumn("__w", weightCol.cast("long"))
      .filter(col("__w").isNotNull && col("__w") > 0)
    val counts = d.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"),
      max(col("__w")).as("__wS"))
    // the keep rule uses the SOURCE's weight from the counts table
    // (max over the source's rows), not the per-row expression, so the
    // semantics stay coherent — "source weight = max(weightCol)" —
    // even if a caller passes a weight column that varies within a
    // source; for the documented per-source-constant weights the two
    // are identical
    //
    // the limiting source (argmin n_s/w_s, source-name tie-break) is
    // folded INTO the counts table as an all-rows window min over the
    // ~|sources| rows — one broadcast build instead of two (the r6
    // form ran a second aggregate job over a recomputed counts subtree
    // and crossJoined its 1-row result)
    //
    // null-source groups and the tie-break: Spark's min(struct(...))
    // compares struct fields ASC NULLS FIRST, i.e. a null __src sorts
    // before every string on an exact double-key tie; the oracle SQL
    // says `ORDER BY key, source NULLS FIRST` so both engines agree
    // BY CONSTRUCTION, not by the corpus happening to have no nulls
    // (r13 ADVICE; same contract in `temperature`)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // null-safe join: groupBy puts null-source rows in their own
    // group, and <=> matches them back — an equi-join would drop them
    val cts = counts.withColumnRenamed(sourceCol, "__src")
      .withColumn("__m",
        min(struct(expr("__n * (2520 div __wS)").as("key"), col("__src"),
          col("__n").as("n_m"), col("__wS").as("w_m"))).over(wAll))
      .select(col("__src"), col("__n"), col("__wS"),
        col("__m.n_m").as("__n_m"), col("__m.w_m").as("__w_m"))
    val kept = d.drop("__w")
      .join(broadcast(cts), col(sourceCol) <=> col("__src"))
      .drop("__src")
      .filter(bucket(idCol) * col("__w_m") * col("__n") <
        lit(256) * col("__wS") * col("__n_m"))
    val outCols =
      if (keepDiagnostics)
        inCols.map(col) :+ col("__wS").as("weight") :+ col("__n").as("n_total")
      else inCols.map(col)
    kept.select(outCols: _*)
  }

  /** Temperature / α-smoothed mixture sampling (XLM-R, Conneau et al.
    * 2020 §3.1 exponential smoothing; T5's temperature-scaled mixing,
    * Raffel et al. 2020 §3.4.3): resample so source shares follow
    * pₛ ∝ nₛ^α instead of the raw nₛ — α<1 flattens the mixture
    * toward uniform, lifting low-resource sources; α=1 is the
    * identity mixture. Unlike [[resample]] the weights are DERIVED
    * from the corpus counts, not configured.
    *
    * Determinism across engines is the design constraint: the derived
    * weight is quantized to `wₛ = max(1, round(R·nₛ^α / n_max^α))`
    * with R a power of two, and the keep decision reuses [[resample]]'s
    * pure-BIGINT rule `bucket·w_m·nₛ < 256·wₛ·n_m` (limiting source
    * argmin nₛ/wₛ kept whole). For α = 0.5 — the common smoothing
    * point — nₛ^α is computed with `sqrt`, which IEEE 754 requires to
    * be correctly rounded, ·R is exact (power of two), and the one
    * division is correctly rounded; every engine computing the same
    * steps lands on the same wₛ bit-for-bit, which is what lets the
    * q_mixture_temperature DuckDB gate hash-match whole doc sets.
    * Other α go through `pow`, which libms round differently in the
    * last ulp — the quantization makes a weight flip vanishingly rare
    * (the ratio must land within ~1 ulp of a half-integer) but not
    * impossible, so only α = 0.5 carries the exact-gate claim.
    *
    * BIGINT bounds: the keep rule's largest product is
    * 256·R·nₛ < 2⁶³, so the default R=1024 is safe to ~3.5×10¹³ rows
    * per source — two decades past a 100 TB corpus.
    *
    * Shape at 100 TB: identical to [[resample]] — per-source counts
    * are one map-side-partial aggregate into a ~|sources|-row table,
    * weights and the limiting row fold inside it, and the keep filter
    * is map-side under a broadcast join; no corpus-scale exchange. */
  def temperature(docs: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, resolution: Int = 1024,
      keepDiagnostics: Boolean = false): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(resolution >= 2 && resolution <= (1 << 20)
      && Integer.bitCount(resolution) == 1,
      s"resolution must be a power of two in [2, 2^20] (power-of-two " +
        s"scaling is exact in IEEE doubles), got $resolution")
    val inCols = docs.columns.toSeq
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // sqrt is IEEE-correctly-rounded (the α=0.5 exact path); pow is not
    def smooth(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    // weight, limiting source, and the broadcast table all fold into
    // the one ~|sources|-row aggregate, exactly as resample's counts
    // (incl. the NULLS FIRST tie-break contract documented there)
    val cts = counts.withColumnRenamed(sourceCol, "__src")
      .withColumn("__wS", greatest(lit(1L),
        round(lit(resolution) * smooth(col("__n"))
          / smooth(max(col("__n")).over(wAll))).cast("long")))
      .withColumn("__m",
        min(struct((col("__n").cast("double") / col("__wS")).as("key"),
          col("__src"), col("__n").as("n_m"), col("__wS").as("w_m"))).over(wAll))
      .select(col("__src"), col("__n"), col("__wS"),
        col("__m.n_m").as("__n_m"), col("__m.w_m").as("__w_m"))
    // null-safe join: a null source resamples like any other group
    val kept = docs.join(broadcast(cts), col(sourceCol) <=> col("__src"))
      .drop("__src")
      .filter(bucket(idCol) * col("__w_m") * col("__n") <
        lit(256) * col("__wS") * col("__n_m"))
    val outCols =
      if (keepDiagnostics)
        inCols.map(col) :+ col("__wS").as("weight") :+ col("__n").as("n_total")
      else inCols.map(col)
    kept.select(outCols: _*)
  }

  /** Fractional-epoch upsampling: every row repeats ⌊e⌋ times plus an
    * md5-coin extra when `bucket < e mod 256`, with e carried in
    * 1/256ths (`e256Col`). Returns the input schema plus a `rep`
    * column (1-based repeat index) — real rows, the form a
    * shard-shuffling writer consumes. Map-side only: no exchange. */
  def epochs(docs: DataFrame, idCol: String, e256Col: Column): DataFrame = {
    val d = docs.withColumn("__e256", e256Col.cast("long"))
      .withColumn("__reps",
        expr("__e256 div 256") +
          when(bucket(idCol) < col("__e256") % 256, 1L).otherwise(0L))
    // reps can be 0 (e < 1.0 downsamples): sequence(1, 0) would yield
    // Spark's DESCENDING [1, 0] — two phantom rows — so empty-guard it;
    // explode drops empty arrays, which is the correct "zero repeats"
    d.withColumn("rep", explode(when(col("__reps") >= 1,
        sequence(lit(1L), col("__reps"))).otherwise(array())))
      .drop("__e256", "__reps")
  }

  /** Materialize the deterministic global training order — the
    * full-corpus form of `q_interleave`'s page: rank every row by
    * md5(id) (a uniform permutation, identical across engines and
    * cluster sizes) and write it as `numShards` sorted shards via ONE
    * range exchange (`repartitionByRange` samples the hash space for
    * balanced bounds) + an in-partition sort — never a global
    * single-partition sort. Shard k's part-file holds a contiguous
    * hash range below shard k+1's, so a trainer streaming the files
    * in name order replays the exact global order, and any subset of
    * shards is an unbiased sample of the corpus.
    *
    * `numShards` is an UPPER bound on the part-file count:
    * RangePartitioner collapses partitions when its sample sees few
    * distinct keys, and empty partitions write no file — so a tiny
    * corpus may emit fewer than `numShards` files. Consumers must
    * list the directory rather than assume exactly S files; at the
    * corpus sizes the shard count is meant for, the bound is met. */
  def writeShuffledShards(docs: DataFrame, idCol: String, outDir: String,
      numShards: Int, tieBreak: Seq[String] = Nil): Unit =
    docs.withColumn("__h", orderKey(idCol))
      .repartitionByRange(numShards, col("__h"), col(idCol))
      .sortWithinPartitions(
        (Seq(col("__h"), col(idCol)) ++ tieBreak.map(col)): _*)
      .drop("__h")
      .write.mode("overwrite").parquet(outDir)

  /** Cap each source at a token budget: keep the greedy prefix of the
    * md5-priority order while the running token total stays within
    * budget — an unbiased deterministic subset (the order is a
    * uniform permutation of the source). One per-source window
    * exchange; a source skewed enough that its single window
    * partition won't sort in one task switches to
    * [[tokenBudgetSalted]] — identical output, boundary-slice sort
    * only. */
  def tokenBudget(docs: DataFrame, sourceCol: String, idCol: String,
      tokensCol: Column, budgetCol: Column): DataFrame = {
    val inCols = docs.columns.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(orderKey(idCol).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("__toks", tokensCol.cast("long"))
      .withColumn("__budget", budgetCol.cast("long"))
      .withColumn("__cum", sum(col("__toks")).over(w))
      .filter(col("__cum") <= col("__budget"))
      .select(inCols.map(col): _*)
  }

  /** Top 8 bits of [[orderKey]] as 0..255 — bucket b's rows are a
    * contiguous slice of the priority order below bucket b+1's
    * (codegen'd [[graft.expressions.Md5BucketHi]]). */
  def bucketHi(idCol: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.Md5BucketHi(
      Bridge.expression(col(idCol).cast("string"))))
  }

  /** The SKEW-SAFE token budget: output-identical to [[tokenBudget]]
    * (property-tested), but no per-source global sort. The md5
    * priority order decomposes by its top byte into 256 contiguous
    * buckets, so the greedy prefix is: every bucket whose cumulative
    * token total fits wholly, NOTHING from buckets past the budget,
    * and the exact in-order prefix of the ONE boundary bucket per
    * source. Phase 1 is a map-side-partial aggregate to a
    * ≤|sources|·256-row table (bucket sums + running `before` totals);
    * phase 2 broadcasts it back and keeps/drops whole buckets with a
    * MAP-SIDE filter; only the boundary slice — ~1/256 of each source,
    * uniformly sampled by construction — pays the window sort. A 1B-row
    * source costs a ~4M-row sort instead of 1B.
    *
    * Budgets are per-SOURCE (the per-source MAX if the expression
    * varies — same convention as [[resample]]'s weights); null-token
    * rows count 0, exactly as the exact kernel's window sum ignores
    * them. */
  def tokenBudgetSalted(docs: DataFrame, sourceCol: String, idCol: String,
      tokensCol: Column, budgetCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inCols = docs.columns.toSeq
    val d = docs
      .withColumn("__toks", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__budget", budgetCol.cast("long"))
      .withColumn("__hb", bucketHi(idCol))
    val per = d.groupBy(col(sourceCol).as("__gsrc"), col("__hb").as("__ghb"))
      .agg(sum(col("__toks")).as("__bsum"), max(col("__budget")).as("__bud"))
    val wSrc = Window.partitionBy("__gsrc")
    val cum = per
      .withColumn("__before", coalesce(sum(col("__bsum")).over(
        wSrc.orderBy("__ghb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__budS", max(col("__bud")).over(wSrc))
      .select(col("__gsrc"), col("__ghb"), col("__bsum"), col("__before"),
        col("__budS"))
    val j = d.drop("__budget")
      .join(broadcast(cum),
        col(sourceCol) <=> col("__gsrc") && col("__hb") <=> col("__ghb"))
    // whole-bucket keep/drop is map-side; at most ONE bucket per source
    // can straddle the budget (before is nondecreasing in __hb)
    val whole = j.filter(col("__before") + col("__bsum") <= col("__budS"))
    val edge = j.filter(col("__before") <= col("__budS") &&
      col("__before") + col("__bsum") > col("__budS"))
    val wEdge = Window.partitionBy(col(sourceCol))
      .orderBy(orderKey(idCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val edgeKept = edge
      .withColumn("__cum", sum(col("__toks")).over(wEdge))
      .filter(col("__before") + col("__cum") <= col("__budS"))
    whole.select(inCols.map(col): _*)
      .unionAll(edgeKept.select(inCols.map(col): _*))
  }
}
