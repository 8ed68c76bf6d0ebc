package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives for the 100 TB path: skew mitigation and
  * co-located (shuffle-free) joins.
  *
  * The reference never needs these (single-process pandas); on a
  * 1000-executor cluster they are the difference between a stage that
  * finishes and one straggler task holding the job for hours.
  */
object Scale {

  /** Salted aggregation for skewed keys: two-phase groupBy. Phase 1
    * groups on (key, salt) — the hot key's rows spread over
    * `saltBuckets` reducers; phase 2 merges the partials on key alone.
    * Only algebraic aggregates survive this split; the caller provides
    * the partial and final expressions (e.g. sum/sum, count/sum). */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
      partial: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finals.head, finals.tail: _*)

  /** Salted join for one skewed left key-column against a small-ish
    * right side: left rows get a random-ish salt in [0, n); the right
    * side is replicated n× with every salt value, so the hot key's
    * rows land on n different reducers instead of one.
    * Right-side replication costs n× its size — use for dimension
    * tables, not fact-fact joins (those want AQE skew-join, which is
    * enabled in the session conf). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N most frequent keys — the skew probe used to decide whether
    * salting / AQE skew hints are worth applying. One pass, distributed. */
  def skewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)

  /** Write both sides bucketed by the join key so subsequent equi-joins
    * are co-located: no Exchange in the plan, each task joins bucket i
    * with bucket i. This is the batch analog of pre-partitioned vector
    * shards, and the right layout for repeated id-joins over a 100 TB
    * VDF dataset (bucket once, join many times shuffle-free). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously written with `writeBucketed` on their
    * bucket key. With matching bucket counts Catalyst plans a
    * SortMergeJoin with NO shuffle on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Sidecar file that makes a directory a SELF-DESCRIBING bucketed
    * layout: Spark's bucket metadata otherwise lives only in a catalog,
    * which local sessions don't persist — a fresh JVM reading the same
    * files would see plain parquet and shuffle anyway. The sidecar
    * carries exactly what re-registration needs (key, bucket count,
    * schema DDL), so `readBucketedDir` can rebuild the catalog entry
    * anywhere — the file-level analogue of a Hive metastore row. */
  val BucketSidecar = "_graft_bucket.json"

  /** The Hadoop conf every driver-side metadata READ resolves its
    * filesystem with: the active session's, falling back to a bare
    * `Configuration` only when no session exists (plain unit tests).
    * The WRITE paths (`writeBucketedDir`, `IvfPq.writeIndex`) already
    * use `spark.sessionState.newHadoopConf()`; a read path built on a
    * bare `new Configuration()` would miss every setting supplied as
    * `spark.hadoop.*` (s3a credentials/endpoint, fs.defaultFS, custom
    * FS impls) — the layout WRITE would succeed and the freshness READ
    * would throw or see nothing, so the layout silently never routes
    * (the r12 ADVICE finding). */
  private[graft] def activeHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Canonical location string: URI paths (hdfs://…, s3a://…) pass
    * through; bare local paths absolutize so the derived table name
    * and LOCATION are stable across working directories. */
  private[graft] def canonicalPath(path: String): String =
    if (path.contains("://")) path
    else new java.io.File(path).getAbsolutePath

  private[graft] def bucketTableName(path: String): String = {
    val abs = canonicalPath(path)
    // stable, identifier-safe, unique per location
    val tail = abs.replaceAll("[^A-Za-z0-9]", "_").takeRight(32)
    f"graft_bkt_${abs.hashCode & 0x7fffffff}%08x_$tail"
  }

  /** Write `df` as a bucketed-by-`key` parquet layout at an explicit
    * PATH (external table + sidecar) — the persistent form of
    * `writeBucketed`, and the ingest-side half of the co-located join
    * story: bucket the 100 TB fact spine ONCE at write time, and every
    * downstream equi-join/group-by on the key plans with zero
    * exchanges (`readBucketedDir` re-registers the layout in any later
    * session). The frame is repartitioned by the key first so each
    * write task owns exactly one bucket (bucketBy and repartition
    * share the hash) and emits one file — which is also what lets
    * Spark trust the per-bucket sort at read time. The files remain
    * readable as PLAIN parquet by engines that don't understand the
    * sidecar (bucketing only adds information). */
  def writeBucketedDir(df: DataFrame, path: String, key: String,
      buckets: Int, sourceFp: Option[String] = None): Unit = {
    val name = bucketTableName(path)
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", canonicalPath(path))
      .format("parquet")
      .saveAsTable(name)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = new java.util.LinkedHashMap[String, Any]()
    payload.put("key", key)
    payload.put("buckets", Integer.valueOf(buckets))
    payload.put("schema_ddl", df.schema.toDDL)
    // freshness link to the SOURCE this layout was derived from (when
    // there is one — a layout that IS the primary copy carries none):
    // `bucketedTable` re-fingerprints the source and falls back to the
    // plain route on mismatch instead of serving stale rows
    sourceFp.foreach(payload.put("source_fp", _))
    // sidecar through the HADOOP filesystem, like the table files it
    // describes — a layout on hdfs://-style storage carries it too
    val sp = new org.apache.hadoop.fs.Path(path, BucketSidecar)
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(sp, true)
    try out.write(mapper.writeValueAsString(payload)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Cheap driver-side fingerprint of a source parquet path (file or
    * directory): md5 over the sorted (relative-path, size, mtime)
    * triples of its data files, walked RECURSIVELY — a partitioned or
    * nested layout (`source/part=a/x.parquet`) fingerprints its leaf
    * files, not just the partition directories, so a regenerated
    * partition changes the fingerprint. For a flat directory the
    * relative path IS the file name, so flat-layout fingerprints (and
    * the sidecars that recorded them) are unchanged. Not a content
    * hash — a rewrite that preserves every byte AND every mtime would
    * pass — but any real regeneration (BigGen, a fresh export) changes
    * it, which is the staleness the `_bucketed` twin needs to detect.
    *
    * MEMOIZED per canonical path (r13): the recursive walk + md5 is a
    * SERIAL driver stage — trivial at 32 files, multi-second at a
    * 100 TB layout's 10⁵–10⁶ source files — and `bucketedTable` used
    * to pay it once per spine table per QUERY. The invalidation key is
    * the strongest CHEAP signal the store offers:
    *   - root is a file, or a directory with a REAL status (nonzero
    *     mtime/length — local FS, HDFS): the root's own
    *     `getFileStatus`, one O(1) RPC. Directory mtimes change on any
    *     child create/delete/rename (every real regeneration);
    *   - root directory status is SYNTHETIC (mtime 0 and length 0 —
    *     what s3a fabricates for prefixes): one non-recursive
    *     `listStatus` of the root. A root-status key would be a
    *     CONSTANT there and could never invalidate — it would
    *     silently serve a stale layout across a mid-session
    *     regeneration, the exact staleness this gate exists to catch.
    *     The listing is O(immediate children) — on an object store
    *     that cost IS the floor for any freshness signal at all.
    * Staleness bound, per class: on real-status stores an in-place
    * child rewrite that leaves the root mtime unchanged (also: two
    * regenerations whose final mutations land within the store's
    * mtime granularity collide on the key — ns on ext4, ms on HDFS;
    * real regenerations take far longer than either); on synthetic-
    * status stores a mutation confined to nested subdirectories that
    * leaves every top-level name/file status unchanged. Neither is
    * detected until the process restarts or the cache is cleared
    * (`invalidateFingerprints()`); that bound is deliberate: closing
    * it would require exactly the full walk the cache exists to
    * avoid — and both bounds are the documented pre-memoization
    * behavior class, not new exposure. */
  def sourceFingerprint(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(canonicalPath(path))
    val fs = p.getFileSystem(activeHadoopConf())
    val rootKey: String =
      if (!fs.exists(p)) "absent"
      else {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) s"file:${st.getLen}:${st.getModificationTime}"
        else if (st.getModificationTime != 0L)
          s"dir:${st.getLen}:${st.getModificationTime}"
        else fs.listStatus(p).toSeq
          .filter(s => !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
          .map(s => s"${s.getPath.getName}:${s.isDirectory}:" +
            s"${s.getLen}:${s.getModificationTime}")
          .sorted.mkString("|")
      }
    val cached = fingerprintCache.get(p.toString)
    if (cached != null && cached._1 == rootKey) cached._2
    else {
      val fp = walkFingerprint(fs, p)
      fingerprintCache.put(p.toString, (rootKey, fp))
      fp
    }
  }

  /** Fingerprint-walk count (diagnostics/spec hook: the memoization
    * contract is "one walk per source path per change", asserted by
    * ScaleSpec). */
  private[graft] val fingerprintWalks =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private val fingerprintCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Drop every memoized fingerprint — the manual invalidation story
    * for the one mutation class the root-status check cannot see (an
    * in-place nested rewrite; see `sourceFingerprint`). */
  def invalidateFingerprints(): Unit = fingerprintCache.clear()

  /** The full recursive walk + md5 behind `sourceFingerprint` — always
    * recomputes; the public entry memoizes it on the root status. */
  private def walkFingerprint(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    fingerprintWalks.incrementAndGet()
    // HADOOP filesystem walk (r12): a source on hdfs://-style storage
    // must fingerprint like a local one. Local descriptors are
    // byte-identical to the java.io form this replaces (relative
    // path : length : mtime-millis), so sidecars recorded before the
    // change stay fresh.
    def walk(d: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(d).toSeq
        .filter(s => !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s))
    val desc =
      if (!fs.exists(p)) ""
      else {
        val st = fs.getFileStatus(p)
        if (st.isDirectory) {
          val rootPrefix = st.getPath.toString + "/"
          walk(st.getPath)
            .map(s => (s.getPath.toString.stripPrefix(rootPrefix), s))
            .sortBy(_._1)
            .map { case (rel, s) =>
              s"$rel:${s.getLen}:${s.getModificationTime}" }
            .mkString("|")
        } else s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
      }
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** The parsed sidecar of a bucketed layout, through the HADOOP
    * filesystem (None when absent). */
  private def readSidecar(path: String): Option[java.util.Map[String, Any]] = {
    val sp = new org.apache.hadoop.fs.Path(path, BucketSidecar)
    val fs = sp.getFileSystem(activeHadoopConf())
    if (!fs.exists(sp)) None
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      // FSDataInputStream is both DataInput and InputStream — pin the
      // jackson overload
      val in: java.io.InputStream = fs.open(sp)
      try Some(mapper.readValue(in, classOf[java.util.Map[String, Any]]))
      finally in.close()
    }
  }

  /** Does `path` carry a bucket sidecar (i.e. IS it a self-describing
    * bucketed layout)? */
  def hasSidecar(path: String): Boolean = {
    val sp = new org.apache.hadoop.fs.Path(path, BucketSidecar)
    sp.getFileSystem(activeHadoopConf()).exists(sp)
  }

  /** The `source_fp` a sidecar recorded at ingest, if any. */
  def sidecarSourceFp(path: String): Option[String] =
    readSidecar(path).flatMap(m => Option(m.get("source_fp")).map(_.toString))

  /** Open a layout written by `writeBucketedDir` WITH its bucket
    * metadata: registers the external table from the sidecar (CREATE
    * IF NOT EXISTS — idempotent, and clones sharing the session's
    * sharedState see the same entry) and returns it. None when the
    * directory carries no sidecar — callers fall back to the plain
    * parquet read. */
  def readBucketedDir(spark: SparkSession, path: String): Option[DataFrame] = {
    val meta = readSidecar(path) match {
      case None => return None
      case Some(m) => m
    }
    val key = meta.get("key").toString
    val buckets = meta.get("buckets").toString.toInt
    val ddl = meta.get("schema_ddl").toString
    val name = bucketTableName(path)
    // SQL string literal: escape embedded single quotes (a path like
    // /data/o'brien otherwise breaks — or worse, reshapes — the DDL)
    val loc = canonicalPath(path).replace("'", "''")
    if (!spark.catalog.tableExists(name))
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $name ($ddl)
           |USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
           |LOCATION '$loc'
           |""".stripMargin)
    Some(spark.table(name))
  }

  /** Bloom-prefiltered semi-join — the runtime-filter pattern, made
    * explicit. A bloom filter over the (small) dim side's keys is
    * aggregated in one pass, broadcast, and applied to the fact side
    * BEFORE its shuffle toward the semi-join; the exact semi-join then
    * removes the bloom's false positives, so the RESULT is identical to
    * a plain semi-join (oracle-checkable) while the shuffle carries
    * only ~selectivity + fpp of the fact table. This is what Spark's
    * own InjectRuntimeFilter does for qualifying shuffle joins; having
    * it as an operator lets a pipeline apply it where the optimizer
    * can't see the opportunity (e.g. the dim side is the output of an
    * arbitrary computation, or the join is expressed as an id-list
    * subset à la `pinecone_import.py:190-196`). Uses Spark's native
    * BloomFilterAggregate / BloomFilterMightContain expressions — both
    * sides hash with the same xxhash64, and the agg merges per-partition
    * sketches, so construction is one distributed pass. */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.Bridge
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(dimKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    // might_contain requires its bloom input be a constant or scalar
    // subquery (the shape InjectRuntimeFilter itself emits): the 1-row
    // aggregate plan becomes a subquery the filter stage consumes.
    val bloomPlan = dim.agg(bloomAgg.as("__bloom"))
      .queryExecution.analyzed
    val bloomExpr =
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomPlan)
    val prefiltered = fact.filter(Bridge.column(BloomFilterMightContain(
      bloomExpr, Bridge.expression(xxhash64(factKey)))))
    prefiltered.join(dim.select(dimKey.as("__bloom_k")).distinct(),
      factKey === col("__bloom_k"), "left_semi")
  }
}
