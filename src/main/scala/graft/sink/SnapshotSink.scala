package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-COMMITTED parquet snapshots — atomic dataset publication
  * without a table format. A 100 TB write that dies halfway must leave
  * readers on either the previous snapshot or the new one, never a mix —
  * and a parquet DIRECTORY cannot promise that: part-files from dead
  * executors, speculative duplicates and half-finished jobs are
  * indistinguishable from committed data in a listing. The fix is the
  * one every table format (Iceberg/Delta/Hudi) builds on: readers list
  * a MANIFEST, not the directory, and commit = one atomic rename of the
  * manifest into place.
  *
  * Layout under the snapshot root:
  *   data/<token>/part-*.parquet   — each commit writes a FRESH subdir
  *   _manifests/v<N>.json          — file list + row count; rename-committed
  *
  * Commit protocol: write data files → write `v<N>.json.tmp` → rename to
  * `v<N>.json` (atomic on HDFS/posix). A crash before the rename leaves
  * orphan data files and a `.tmp` — both invisible to readers, who only
  * trust fully-renamed manifests. The latest snapshot IS max(N) over
  * committed manifests, so there is no second pointer file to race on.
  * Single concurrent committer assumed (the version counter is
  * read-allocate-rename); readers need no coordination at any
  * concurrency.
  *
  * Scale notes: the manifest holds file PATHS (O(files), KBs–MBs at
  * 100 TB with sane file sizing) — never row data; the row count comes
  * from parquet footers (a metadata-only job, no data scan); old
  * snapshots stay readable until their data subdirs are vacuumed, which
  * is what makes reader/writer isolation free. */
object SnapshotSink {

  final case class Snapshot(version: Int, files: Seq[String], rows: Long)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  /** Path-canonical string form — sidecar file strings come from
    * `input_file_name()` (`file:///…`) while manifest files come from
    * `Path.toString` (`file:/…`); every cross-comparison goes through
    * this or victim files silently mismatch (the q154 lesson). */
  private def canon(p: String): String = new Path(p).toString

  /** Total of a sidecar frame's `rows` column (0 for an empty frame). */
  private def totalRows(sidecar: DataFrame): Long =
    Option(sidecar.agg(sum("rows")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  /** Committed versions, ascending (fully-renamed manifests only). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Write `df`'s data files into a fresh data subdir — NO manifest yet,
    * so nothing is visible to readers. Returns the file list. */
  private def writeFiles(df: DataFrame, root: String): Seq[String] = {
    val spark = df.sparkSession
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataPath = new Path(new Path(root, "data"), token)
    df.write.parquet(dataPath.toString)
    val f = fs(spark, dataPath)
    f.listStatus(dataPath).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
  }

  /** Write `df`'s data files into a fresh data subdir — NO manifest yet,
    * so nothing is visible to readers. Returns (files, rows). */
  private def writeData(df: DataFrame, root: String): (Seq[String], Long) = {
    val spark = df.sparkSession
    val files = writeFiles(df, root)
    // Exact row count from parquet footer METADATA. For small commits the
    // footers are read on the driver (r16 optimization: the previous
    // `spark.read.parquet(files).count()` was already footer-only but
    // still planned and scheduled one Spark job per commit — pure
    // scheduler latency for state-sized snapshots, ~40 commit sites across
    // the query surface). A commit with many files keeps the DISTRIBUTED
    // footer count: driver-serial footer I/O is O(files) and the driver
    // should not do data-proportional work (guide §5).
    val rows =
      if (files.isEmpty) 0L
      else if (files.size <= 64) {
        val conf = spark.sessionState.newHadoopConf()
        files.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(p), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      } else spark.read.parquet(files: _*).count()
    (files, rows)
  }

  /** Rename-commit a manifest for `version` over `files`. */
  private def writeManifest(
      spark: SparkSession, root: String, version: Int,
      files: Seq[String], rows: Long): Snapshot = {
    val mdir = manifestDir(root)
    val f = fs(spark, mdir)
    f.mkdirs(mdir)
    val tmp = new Path(mdir, s"v$version.json.tmp")
    val fin = new Path(mdir, s"v$version.json")
    val json = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      s"""{"version":$version,"rows":$rows,"files":[${files.map(q).mkString(",")}]}"""
    }
    val out = f.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, fin))
      throw new IllegalStateException(s"snapshot commit failed: cannot rename $tmp to $fin")
    Snapshot(version, files, rows)
  }

  /** Write `df` as the next snapshot version and commit it atomically.
    * Returns the committed snapshot descriptor. */
  def commit(df: DataFrame, root: String): Snapshot = {
    val spark = df.sparkSession
    val (files, rows) = writeData(df, root)
    val version = versions(spark, root).lastOption.getOrElse(0) + 1
    writeManifest(spark, root, version, files, rows)
  }

  /** APPEND `df` as the next snapshot version WITHOUT rewriting existing
    * data: the batch lands in a fresh data subdir and the new manifest
    * references the previous version's files PLUS the new ones — an
    * add-files commit, O(batch) write I/O per append instead of the
    * O(table) rewrite a read-union-recommit costs. This is how a
    * corpus-sized table (e.g. an ANN signature index, q143) grows
    * incrementally; state-sized tables can afford either. Readers of
    * prior versions are untouched (their file lists never change). */
  def append(df: DataFrame, root: String): Snapshot = {
    val spark = df.sparkSession
    val prior = versions(spark, root).lastOption
      .map(v => snapshot(spark, root, Some(v)))
    // batch data lands invisibly first; the ONE manifest rename then
    // publishes prior files + batch files together — same atomicity as
    // commit, O(batch) write I/O
    val (files, rows) = writeData(df, root)
    val all = (prior.map(_.files).getOrElse(Seq.empty) ++ files).sorted
    val total = prior.map(_.rows).getOrElse(0L) + rows
    val version = prior.map(_.version).getOrElse(0) + 1
    writeManifest(spark, root, version, all, total)
  }

  /** Read `v`'s manifest directly — the caller vouches `v` is committed
    * (no directory re-listing; [[history]] reads V manifests off ONE
    * listing instead of V+1). */
  private def readManifest(spark: SparkSession, root: String, v: Int): Snapshot = {
    val p = new Path(manifestDir(root), s"v$v.json")
    val f = fs(spark, p)
    val in = f.open(p)
    val json =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    // manifest fields are machine-written (see commit) — parse positionally
    val rows = """"rows":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    Snapshot(v, parseFilesArray(json), rows)
  }

  /** The committed snapshot descriptor for `version` (default: latest). */
  def snapshot(spark: SparkSession, root: String, version: Option[Int] = None): Snapshot = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed snapshots under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"snapshot v$v not committed (have ${vs.mkString(",")})")
    readManifest(spark, root, v)
  }

  /** The `"files":[...]` array, parsed by an escape-aware character walk.
    * A naive split-on-comma corrupts any path CONTAINING a comma (legal
    * in URIs), and unescaping `\"` before `\\` mangles trailing
    * backslash-quote runs (r7 advisor finding) — a string scanner that
    * honors JSON escapes in one pass has neither failure mode. */
  private[graft] def parseFilesArray(json: String): Seq[String] = {
    val tag = "\"files\":["
    val start = json.indexOf(tag)
    require(start >= 0, s"malformed manifest (no files array): ${json.take(200)}")
    var i = start + tag.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var done = false
    while (!done) {
      require(i < json.length, "malformed manifest: unterminated files array")
      val c = json.charAt(i)
      if (inStr) c match {
        case '\\' =>
          require(i + 1 < json.length, "malformed manifest: dangling escape")
          sb.append(json.charAt(i + 1)) // commit only emits \" and \\
          i += 2
        case '"' => out += sb.result(); sb.clear(); inStr = false; i += 1
        case ch  => sb.append(ch); i += 1
      } else c match {
        case '"'       => inStr = true; i += 1
        case ']'       => done = true
        case ',' | ' ' => i += 1
        case ch => throw new IllegalStateException(
          s"malformed manifest: unexpected '$ch' in files array")
      }
    }
    out.toSeq
  }

  /** DESCRIBE HISTORY analog: one row per committed version —
    * `(version, n_files, n_rows)` — read from the manifests alone
    * (metadata-only; no data I/O). The audit surface a lineage needs:
    * which commit grew the table, what a vacuum would retire, where a
    * time-travel read lands. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(spark, root) // ONE listing; then one manifest read per version
      .map { v =>
        val s = readManifest(spark, root, v)
        (v, s.files.size, s.rows)
      }
      .toDF("version", "n_files", "n_rows")
  }

  private def publishDir(root: String) = new Path(root, "_published")

  private def publishSeqs(spark: SparkSession, root: String): Seq[Int] = {
    val dir = publishDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("p\\d+\\.json") =>
        s.stripPrefix("p").stripSuffix(".json").toInt }
      .sorted
  }

  /** WRITE–AUDIT–PUBLISH promotion: mark a COMMITTED version as the one
    * published readers see. Commits are the WRITE, the caller's checks
    * between commit and this call are the AUDIT, and this pointer is
    * the PUBLISH — staged versions stay invisible to
    * [[readPublished]] until promoted (the Iceberg WAP discipline on
    * this store). The pointer advances by the manifest rename
    * discipline (write temp, atomic rename), and pointer files are
    * SEQUENCED, never overwritten, so the publish history — including
    * rollbacks to an older version — is itself auditable. */
  def publish(spark: SparkSession, root: String, version: Int): Unit = {
    require(versions(spark, root).contains(version),
      s"cannot publish uncommitted version $version")
    val pdir = publishDir(root)
    val f = fs(spark, pdir)
    f.mkdirs(pdir)
    val seq = publishSeqs(spark, root).lastOption.getOrElse(0) + 1
    val tmp = new Path(pdir, s"p$seq.json.tmp")
    val fin = new Path(pdir, s"p$seq.json")
    val out = f.create(tmp, true)
    try out.write(s"""{"seq":$seq,"version":$version}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, fin))
      throw new IllegalStateException(s"publish failed: cannot rename $tmp to $fin")
  }

  /** The currently published version (highest-sequence pointer), or
    * None when nothing has been published yet. */
  def publishedVersion(spark: SparkSession, root: String): Option[Int] = {
    publishSeqs(spark, root).lastOption.map { seq =>
      val p = new Path(publishDir(root), s"p$seq.json")
      val in = fs(spark, p).open(p)
      val json =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      """"version":(\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
    }
  }

  /** Read through the published pointer — what a downstream consumer
    * sees; staged (committed-but-unpublished) versions are invisible. */
  def readPublished(spark: SparkSession, root: String): DataFrame = {
    val v = publishedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"nothing published at $root"))
    read(spark, root, Some(v))
  }

  /** CHANGE DATA CAPTURE between two committed versions, keyed:
    * `I` inserted, `D` deleted, `U` updated (same key, different
    * non-key payload); unchanged rows are omitted. Payload columns
    * come from the TO side for I/U and the FROM side for D — the
    * minimal keyed delta an incremental downstream consumer replays
    * instead of re-reading the table. One full-outer join on the key
    * (both sides are manifest reads, so CDC between ANY two versions
    * costs two snapshot scans regardless of how many commits lie
    * between them). */
  def cdc(spark: SparkSession, root: String, fromV: Int, toV: Int,
          keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val from = read(spark, root, Some(fromV))
    val to = read(spark, root, Some(toV))
    require(from.columns.sorted.sameElements(to.columns.sorted),
      s"cdc requires matching schemas, got ${from.columns.toSeq} vs ${to.columns.toSeq}")
    require(keyCols.nonEmpty && keyCols.forall(from.columns.contains),
      "key columns must exist")
    val others = from.columns.filterNot(keyCols.contains).toSeq
    val f = from.select(keyCols.map(col) :+
      struct(others.map(col): _*).as("_vf"): _*)
    val t = to.select(keyCols.map(col) :+
      struct(others.map(col): _*).as("_vt"): _*)
    f.join(t, keyCols, "full_outer")
      .withColumn("op",
        when(col("_vf").isNull, "I")
          .when(col("_vt").isNull, "D")
          .when(col("_vf") =!= col("_vt"), "U"))
      .filter(col("op").isNotNull)
      .withColumn("_v", coalesce(col("_vt"), col("_vf")))
      .select(col("op") +: keyCols.map(col) ++:
        others.map(o => col(s"_v.$o").as(o)): _*)
  }

  /** Read a committed snapshot BY ITS MANIFEST — orphan files in the
    * data directories are invisible by construction. */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    spark.read.parquet(s.files: _*)
  }

  // ===== Zone maps: per-file min/max stats sidecar + pruned reads =====
  //
  // The data-skipping half of the ClickHouse sort-key story the reference
  // leans on (`reference/seghouse/warehouse/clickhouse.py:86-87` —
  // `PARTITION BY toDate(timestamp) ORDER BY (timestamp, message_id)`
  // exists precisely so the server can skip granules by primary-key
  // range): a snapshot committed through [[commitWithStats]] carries a
  // QUERYABLE parquet sidecar of per-file bounds, and [[readPruned]]
  // drops every file whose [min,max] cannot intersect the predicate
  // BEFORE Spark ever lists it. Layout clustering is the caller's lever —
  // `repartitionByRange` on the stats column gives tight disjoint
  // per-file ranges (the ZOrder module's multi-column variant composes
  // the same way), after which an equality/range probe touches O(1)
  // files out of O(table).
  //
  // Scale notes: the stats job replaces the plain-commit count pass (one
  // column-pruned, map-side-combined aggregate over the just-written
  // batch — O(batch) like the count it replaces, and it yields the row
  // count for free); the sidecar is O(files × statsCols) parquet — at a
  // million files it is itself a well-formed small table, which is why
  // it is stored as parquet and not folded into the JSON manifest. The
  // sidecar is written BEFORE the manifest rename, so commit atomicity
  // is unchanged: an unreferenced `.stats` dir from a crashed commit is
  // invisible (readers resolve stats through the committed version
  // number) and is swept by vacuum after the orphan grace.

  private def statsDir(root: String, version: Int) =
    new Path(manifestDir(root), s"v$version.stats")

  /** One row per data file: `file`, `rows`, and for each stats column
    * `<c>__min` / `<c>__max` / `<c>__nulls` in the column's NATIVE type
    * (parquet preserves it, so pruning comparisons never round-trip
    * through strings). Exact bounds — computed from the committed rows
    * themselves; a petabyte deployment could swap in a footer-metadata
    * job without changing the sidecar contract. */
  /** Fixed-point type for per-file measure sums: exact, mergeable
    * across files (decimal addition is associative — the property the
    * metadata-only aggregate path rests on), and wide enough that
    * file-level partials never overflow. */
  private val SumDec = "decimal(30,6)"

  private def computeFileStats(
      spark: SparkSession, files: Seq[String], statsCols: Seq[String],
      sumCols: Seq[String] = Seq.empty): DataFrame = {
    val base = spark.read.parquet(files: _*)
      .select(input_file_name().as("file") +:
        (statsCols ++ sumCols).distinct.map(col): _*)
    val aggs = count(lit(1L)).as("rows") +: (statsCols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"),
      sum(col(c).isNull.cast("long")).as(s"${c}__nulls"))) ++
      sumCols.map(m =>
        sum(col(m).cast("decimal(18,6)")).cast(SumDec).as(s"${m}__sum")))
    base.groupBy("file").agg(aggs.head, aggs.tail: _*)
  }

  /** [[commit]], plus a zone-map sidecar over `statsCols`. The row count
    * comes from the same single stats pass (no separate count job). */
  def commitWithStats(df: DataFrame, root: String, statsCols: Seq[String]): Snapshot = {
    require(statsCols.nonEmpty, "commitWithStats needs at least one stats column")
    commitIndexed(df, root, statsCols, None)
  }

  /** [[append]], plus a zone-map sidecar: the new version's sidecar is
    * the prior sidecar's rows (stats are per-file facts — files never
    * change once committed) plus the batch's freshly computed rows, so an
    * append costs O(batch) stats work + O(files) sidecar metadata, never
    * a table re-scan. The prior version must itself carry stats over the
    * same columns. */
  def appendWithStats(df: DataFrame, root: String, statsCols: Seq[String]): Snapshot = {
    require(statsCols.nonEmpty, "appendWithStats needs at least one stats column")
    appendIndexed(df, root, statsCols, None)
  }

  /** The zone-map sidecar of `version` (default latest) as a DataFrame —
    * stats are themselves a queryable table. Fails with a pointed message
    * for versions committed without stats. */
  def statsTable(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val s = snapshot(spark, root, version)
    val p = statsDir(root, s.version)
    require(fs(spark, p).exists(p),
      s"snapshot v${s.version} has no zone-map sidecar (committed without " +
        "stats — use commitWithStats/appendWithStats)")
    spark.read.parquet(p.toString)
  }

  final case class PrunedRead(
      df: DataFrame, keptFiles: Int, totalFiles: Int,
      files: Seq[String] = Seq.empty)

  /** Read `version` (default latest) with files pruned by the zone map:
    * keep only files whose [min,max] on `c` can intersect [lo, hi], then
    * apply the residual `lo <= c <= hi` filter (pruning is file-granular;
    * the predicate still runs — and pushes down to row groups — inside
    * kept files). All-null files are pruned: a range predicate is
    * null-rejecting. The kept/total counts are returned for audit.
    *
    * The kept-file list is collected on the driver — O(files) metadata,
    * the same order every manifest read already costs; a deployment with
    * millions of files would push this selection into a join against the
    * sidecar table instead. */
  /** The zone-map kept-file list for `lo ≤ c ≤ hi` on `version` —
    * shared by the single, set-composite and multi-range reads so the
    * composite paths intersect LISTS instead of constructing and
    * discarding DataFrames. */
  private def keptByRange(
      spark: SparkSession, root: String, version: Int,
      c: String, lo: Any, hi: Any): Seq[String] = {
    val mn = col(s"${c}__min")
    val mx = col(s"${c}__max")
    statsTable(spark, root, Some(version))
      .filter(mn.isNotNull && mx.isNotNull && !(mn > lit(hi) || mx < lit(lo)))
      .select("file").collect().map(_.getString(0)).toSeq.sorted
  }

  def readPruned(
      spark: SparkSession, root: String, c: String, lo: Any, hi: Any,
      version: Option[Int] = None): PrunedRead = {
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    val kept = keptByRange(spark, root, s.version, c, lo, hi)
    val df =
      if (kept.isEmpty)
        spark.read.parquet(s.files: _*).filter(lit(false))
      else
        spark.read.parquet(kept: _*).filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    PrunedRead(df, kept.size, s.files.size, kept)
  }

  // ===== Set skipping index: per-file Bloom sidecar + pruned reads =====
  //
  // Zone maps skip on RANGE (and need a clustered layout); the set index
  // skips on MEMBERSHIP and needs none — ClickHouse's `tokenbf_v1`
  // secondary index, here at file grain: each data file carries one
  // Bloom filter over a caller-defined per-row hash SET (token hashes
  // for full-text probes, user-id hashes for point lookups), and a probe
  // reads only files whose filter might contain the hash. No false
  // negatives ⇒ pruning is lossless for any predicate that IMPLIES
  // "some row's key set contains h"; false positives only add files.
  // Built by one map-side-combined BloomSetAgg pass (each partition
  // ships one filter per file to the shuffle — state-sized, like the
  // zone-map stats job it runs beside).

  private def setIndexDir(root: String, version: Int) =
    new Path(manifestDir(root), s"v$version.setidx")

  /** One set-index row per file of `files`: `(file, rows, bloom)`. */
  private def computeSetIndex(
      spark: SparkSession, files: Seq[String],
      keys: org.apache.spark.sql.Column, expectedPerFile: Long,
      fpp: Double): DataFrame = {
    require(expectedPerFile > 0, "expectedPerFile must be positive")
    spark.read.parquet(files: _*)
      .select(input_file_name().as("file"), keys.as("ks"))
      .groupBy("file")
      .agg(count(lit(1L)).as("rows"),
        graft.plans.BloomSetAgg.bloomSetAgg(col("ks"), expectedPerFile, fpp).as("bloom"))
  }

  /** [[commitWithStats]]'s sibling for membership probes: commit `df`
    * with a per-file Bloom sidecar over `keys` (a LongType or
    * ARRAY<BIGINT> column computed FROM the written columns, e.g.
    * `portableHash64(tokens(col("text")))`). `expectedPerFile` sizes
    * each filter (distinct keys per file; ~1.2 KB per 1k keys at 1%). */
  def commitWithSetIndex(
      df: DataFrame, root: String, keys: org.apache.spark.sql.Column,
      expectedPerFile: Long, fpp: Double = 0.01): Snapshot =
    commitIndexed(df, root, Seq.empty, Some((keys, expectedPerFile, fpp)))

  /** Commit with BOTH sidecars — range zone maps over `statsCols` AND a
    * membership Bloom over `setKeys` — the primary-plus-secondary-index
    * serve (cluster on time, point-probe on entity): a probe constrained
    * on both dimensions reads only the INTERSECTION of each index's kept
    * files ([[readPruned]] ∩ [[readSetPruned]] file sets via
    * [[readPrunedBoth]]). Both sidecars derive from one column-pruned
    * pass over the just-written batch. Either index list may be empty /
    * None — [[commitWithStats]] and [[commitWithSetIndex]] are the
    * single-index specializations. */
  def commitIndexed(
      df: DataFrame, root: String, statsCols: Seq[String],
      setKeys: Option[(org.apache.spark.sql.Column, Long, Double)],
      sumCols: Seq[String] = Seq.empty): Snapshot = {
    require(statsCols.nonEmpty || setKeys.nonEmpty,
      "commitIndexed needs at least one index (stats columns or set keys)")
    require(sumCols.isEmpty || statsCols.nonEmpty,
      "sumCols ride the zone-map sidecar — statsCols must be non-empty")
    val spark = df.sparkSession
    val files = writeFiles(df, root)
    val version = versions(spark, root).lastOption.getOrElse(0) + 1
    if (files.isEmpty) // zero-part write: an empty version, like commit()
      return writeManifest(spark, root, version, Seq.empty, 0L)
    var rows = -1L
    if (statsCols.nonEmpty) {
      val stats = computeFileStats(spark, files, statsCols, sumCols)
        .coalesce(1).localCheckpoint(true)
      rows = totalRows(stats)
      stats.write.mode("overwrite").parquet(statsDir(root, version).toString)
    }
    setKeys.foreach { case (keys, expectedPerFile, fpp) =>
      val idx = computeSetIndex(spark, files, keys, expectedPerFile, fpp)
        .coalesce(1).localCheckpoint(true)
      if (rows < 0)
        rows = totalRows(idx)
      idx.write.mode("overwrite").parquet(setIndexDir(root, version).toString)
    }
    writeManifest(spark, root, version, files, rows)
  }

  /** Conjunctive multi-range pruned read: keep only files whose bounds
    * can intersect EVERY `(column, lo, hi)` range, then apply the full
    * residual conjunction. This is the read side of a Z-ORDERED layout
    * (`operators/ZOrder.zValue`): z-contiguous files span a narrow
    * range of BOTH interleaved dimensions, so a two-predicate probe
    * prunes multiplicatively where a single-column sort layout prunes
    * on its sort key only — the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * serve, on the same sidecar [[readPruned]] uses. */
  def readPrunedRanges(
      spark: SparkSession, root: String, ranges: Seq[(String, Any, Any)],
      version: Option[Int] = None): PrunedRead = {
    require(ranges.nonEmpty, "readPrunedRanges needs at least one range")
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    val keep = ranges.map { case (c, lo, hi) =>
      val mn = col(s"${c}__min")
      val mx = col(s"${c}__max")
      mn.isNotNull && mx.isNotNull && !(mn > lit(hi) || mx < lit(lo))
    }.reduce(_ && _)
    val kept = statsTable(spark, root, Some(s.version))
      .filter(keep).select("file").collect().map(_.getString(0)).toSeq.sorted
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val df =
      if (kept.isEmpty) spark.read.parquet(s.files: _*).filter(lit(false))
      else spark.read.parquet(kept: _*).filter(residual)
    PrunedRead(df, kept.size, s.files.size, kept)
  }

  /** [[appendWithStats]]'s generalization to both sidecars: add-files
    * append with the zone-map sidecar extended by the batch's rows and
    * the set-index sidecar extended by the batch's per-file filters
    * (per-file facts both — files never change once committed, so prior
    * sidecar rows carry over verbatim; O(batch) index work + O(files)
    * sidecar metadata per append). Each sidecar is extended only if the
    * prior version carries it (and the batch must then supply the
    * matching columns/keys), so a stats-only lineage stays stats-only
    * under the specialized entry points. */
  def appendIndexed(
      df: DataFrame, root: String, statsCols: Seq[String],
      setKeys: Option[(org.apache.spark.sql.Column, Long, Double)],
      sumCols: Seq[String] = Seq.empty): Snapshot = {
    require(statsCols.nonEmpty || setKeys.nonEmpty,
      "appendIndexed needs at least one index (stats columns or set keys)")
    require(sumCols.isEmpty || statsCols.nonEmpty,
      "sumCols ride the zone-map sidecar — statsCols must be non-empty")
    val spark = df.sparkSession
    val prior = versions(spark, root).lastOption.map { v =>
      (snapshot(spark, root, Some(v)), v)
    }
    val files = writeFiles(df, root)
    if (files.isEmpty) // empty batch: nothing to add, no version burned
      return prior.map(_._1).getOrElse(
        writeManifest(spark, root, 1, Seq.empty, 0L))
    val version = prior.map(_._2).getOrElse(0) + 1
    val all = (prior.map(_._1.files).getOrElse(Seq.empty) ++ files).sorted
    var rows = -1L
    if (statsCols.nonEmpty) {
      val fresh = computeFileStats(spark, files, statsCols, sumCols)
      val stats = prior.map { p =>
        val pst = statsTable(spark, root, Some(p._2))
        // loud schema guard: an append must extend the sidecar with the
        // SAME statsCols/sumCols the lineage was committed with, or a
        // sum-carrying lineage silently becomes unappendable
        require(pst.columns.toSet == fresh.columns.toSet,
          s"stats sidecar schema mismatch: prior has " +
            s"[${pst.columns.sorted.mkString(",")}], this append computes " +
            s"[${fresh.columns.sorted.mkString(",")}] — pass the lineage's " +
            "original statsCols and sumCols")
        pst.unionByName(fresh)
      }.getOrElse(fresh).coalesce(1).localCheckpoint(true)
      rows = totalRows(stats)
      stats.write.mode("overwrite").parquet(statsDir(root, version).toString)
    }
    setKeys.foreach { case (keys, expectedPerFile, fpp) =>
      val fresh = computeSetIndex(spark, files, keys, expectedPerFile, fpp)
      val idx = prior.map { p =>
        val pd = setIndexDir(root, p._2)
        require(fs(spark, pd).exists(pd),
          s"prior snapshot v${p._2} has no set index to extend " +
            "(committed without one — use commitWithSetIndex/commitIndexed)")
        spark.read.parquet(pd.toString).unionByName(fresh)
      }.getOrElse(fresh).coalesce(1).localCheckpoint(true)
      if (rows < 0)
        rows = totalRows(idx)
      idx.write.mode("overwrite").parquet(setIndexDir(root, version).toString)
    }
    writeManifest(spark, root, version, all, rows)
  }

  /** Read `version` (default latest) pruned by BOTH indexes: files must
    * survive the zone-map range test on `c` ∈ [lo, hi] AND the set-index
    * membership probe for `h`. The range residual is applied; the
    * caller re-applies its exact membership predicate (same soundness
    * contract as [[readSetPruned]]). */
  def readPrunedBoth(
      spark: SparkSession, root: String, c: String, lo: Any, hi: Any, h: Long,
      version: Option[Int] = None): PrunedRead = {
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    val kept = (keptByRange(spark, root, s.version, c, lo, hi).toSet intersect
      keptBySet(spark, root, s.version, h).toSet).toSeq.sorted
    val df =
      if (kept.isEmpty) spark.read.parquet(s.files: _*).filter(lit(false))
      else spark.read.parquet(kept: _*).filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    PrunedRead(df, kept.size, s.files.size, kept)
  }

  /** Read `version` (default latest) keeping only files whose set index
    * might contain `h`. SOUND ONLY for predicates that require some
    * row's key set to contain `h` (the caller re-applies the exact
    * predicate; a pruned file provably has no such row). Per-file probe
    * runs on the driver over the sidecar — metadata-scale, like the
    * zone-map path. */
  /** The set-index kept-file list for probe `h` on `version`. */
  private def keptBySet(
      spark: SparkSession, root: String, version: Int, h: Long): Seq[String] = {
    val p = setIndexDir(root, version)
    require(fs(spark, p).exists(p),
      s"snapshot v$version has no set index (committed without one — " +
        "use commitWithSetIndex)")
    spark.read.parquet(p.toString).select("file", "bloom").collect()
      .filter(r => graft.plans.BloomSetAgg.mightContain(r.getAs[Array[Byte]]("bloom"), h))
      .map(_.getString(0)).toSeq.sorted
  }

  def readSetPruned(
      spark: SparkSession, root: String, h: Long,
      version: Option[Int] = None): PrunedRead = {
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    val kept = keptBySet(spark, root, s.version, h)
    val df =
      if (kept.isEmpty) spark.read.parquet(s.files: _*).filter(lit(false))
      else spark.read.parquet(kept: _*)
    PrunedRead(df, kept.size, s.files.size, kept)
  }

  /** METADATA-ONLY AGGREGATE SERVING — the endgame of the zone-map
    * sidecar: `count(*)` and `sum(measure)` over `lo ≤ c ≤ hi` answered
    * by PARTITIONING THE FILE SET, not the rows. Files fully CONTAINED
    * in the range (min ≥ lo ∧ max ≤ hi) contribute their sidecar `rows`
    * and `measure__sum` — no data read at all; only BOUNDARY files
    * (overlapping but not contained) are scanned with the residual
    * filter. On a range-clustered layout a 100 TB table answers a
    * window aggregate from KBs of sidecar plus ≤2 boundary-file scans —
    * ClickHouse's partition-pruned count with the sum riding along.
    * Exact because per-file sums are fixed-point decimals (associative
    * addition) computed from the same committed rows; requires the
    * snapshot to carry `measure` in `sumCols` at commit time.
    *
    * Returns one row `(n, sum)` — `sum` in the sidecar's DECIMAL type;
    * plus the audit counts (metadata-served / scanned / total files).
    * One SQL-semantics edge: an all-null measure yields SUM() = NULL in
    * SQL but 0 here (the metadata path cannot distinguish "no rows"
    * from "all null") — callers with nullable measures own that
    * convention. */
  final case class AggServed(df: DataFrame, metaFiles: Int, scanFiles: Int, totalFiles: Int)

  def aggRangeFromStats(
      spark: SparkSession, root: String, c: String, lo: Any, hi: Any,
      measure: String, version: Option[Int] = None): AggServed = {
    val s = snapshot(spark, root, version)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files")
    val st = statsTable(spark, root, Some(s.version))
    require(st.columns.contains(s"${measure}__sum"),
      s"snapshot v${s.version} has no per-file sums for '$measure' " +
        "(pass it in sumCols at commit time)")
    val mn = col(s"${c}__min")
    val mx = col(s"${c}__max")
    val overlaps = mn.isNotNull && mx.isNotNull && !(mn > lit(hi) || mx < lit(lo))
    // metadata-only service requires EVERY row of the file to satisfy
    // the range — null-c rows are invisible to min/max but rejected by
    // the residual filter, so a null-carrying file must scan (the same
    // null guard expireBelow's whole-file drop uses)
    val contained = overlaps && mn >= lit(lo) && mx <= lit(hi) &&
      col(s"${c}__nulls") === lit(0L)
    val parts = st.select(col("file"), col("rows"), col(s"${measure}__sum").as("msum"),
        overlaps.as("ov"), contained.as("cont"))
      .filter(col("ov")).collect()
    val (meta, boundary) = parts.partition(_.getAs[Boolean]("cont"))
    val metaN = meta.map(_.getAs[Long]("rows")).sum
    val metaSum = meta.map(r => Option(r.getAs[java.math.BigDecimal]("msum")))
      .flatten.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val metaDf = spark.range(1).select(
      lit(metaN).as("n"), lit(metaSum).cast(SumDec).as("s"))
    val scanned =
      if (boundary.isEmpty) metaDf.filter(lit(false))
      else spark.read.parquet(boundary.map(_.getString(0)).toIndexedSeq.sorted: _*)
        .filter(col(c) >= lit(lo) && col(c) <= lit(hi))
        .agg(count(lit(1L)).as("n"),
          sum(col(measure).cast("decimal(18,6)")).cast(SumDec).as("s"))
    val out = metaDf.unionByName(scanned)
      .agg(sum("n").cast("long").as("n"), sum("s").cast(SumDec).as("sum"))
    AggServed(out, meta.length, boundary.length, s.files.size)
  }

  /** The shared sidecar tail of every targeted maintenance op
    * (delete/upsert/TTL): write version `version`'s sidecars by
    * CARRYING the prior version's rows for files whose canonical path
    * is in `carriedCanon` and recomputing rows for `newFiles`.
    * WHICHEVER sidecar the prior version carries is extended — a
    * dual-indexed lineage (commitIndexed with stats AND set keys) stays
    * dual-indexed through maintenance; a present sidecar whose rebuild
    * parameters weren't passed is refused loudly rather than silently
    * severed. Returns the new version's total rows. */
  private def carrySidecars(
      spark: SparkSession, root: String, priorVersion: Int, version: Int,
      carriedCanon: Set[String], newFiles: Seq[String],
      statsCols: Seq[String], sumCols: Seq[String],
      setKeys: Option[(org.apache.spark.sql.Column, Long, Double)]): Long = {
    var rows = -1L
    def carried(sidecar: DataFrame): DataFrame = {
      val keepList = sidecar.select("file").collect().map(_.getString(0))
        .filter(f => carriedCanon.contains(canon(f))).toSeq
      sidecar.filter(col("file").isin(keepList: _*))
    }
    val sd = statsDir(root, priorVersion)
    if (fs(spark, sd).exists(sd)) {
      require(statsCols.nonEmpty,
        "lineage carries a zone-map sidecar — pass its statsCols (and " +
          "sumCols) so the maintenance op can extend it")
      val prior = carried(spark.read.parquet(sd.toString))
      val fresh =
        if (newFiles.isEmpty) prior.limit(0)
        else computeFileStats(spark, newFiles, statsCols, sumCols)
      require(prior.columns.toSet == fresh.columns.toSet,
        s"stats sidecar schema mismatch: prior has " +
          s"[${prior.columns.sorted.mkString(",")}], this op computes " +
          s"[${fresh.columns.sorted.mkString(",")}] — pass the lineage's " +
          "original statsCols and sumCols")
      val stats = prior.unionByName(fresh).coalesce(1).localCheckpoint(true)
      rows = totalRows(stats)
      stats.write.mode("overwrite").parquet(statsDir(root, version).toString)
    }
    val xd = setIndexDir(root, priorVersion)
    if (fs(spark, xd).exists(xd)) {
      require(setKeys.nonEmpty,
        "lineage carries a set index — pass setKeys (keys column, " +
          "expectedPerFile, fpp) so the maintenance op can extend it")
      val (keys, expectedPerFile, fpp) = setKeys.get
      val prior = carried(spark.read.parquet(xd.toString))
      val idx = (if (newFiles.isEmpty) prior
        else prior.unionByName(
          computeSetIndex(spark, newFiles, keys, expectedPerFile, fpp)))
        .coalesce(1).localCheckpoint(true)
      if (rows < 0) rows = totalRows(idx)
      idx.write.mode("overwrite").parquet(setIndexDir(root, version).toString)
    }
    require(rows >= 0, "lineage has no sidecars to carry")
    rows
  }

  /** TARGETED DELETE — the lakehouse DELETE with the Bloom set index
    * doing the file targeting, and the store-side half of the q124
    * right-to-be-forgotten pass: only files whose set index might
    * contain `h` are rewritten (minus rows where `pred` is strictly
    * TRUE — null predicates keep their rows, the IS DISTINCT FROM
    * convention a deletion wants); every other file is carried into the
    * next version VERBATIM, so the write cost is O(victim files), not
    * O(table) — on an entity-bucketed 100 TB layout, deleting one user
    * touches the handful of files that user ever landed in. Soundness
    * is the set-index contract: `pred` must imply "this row's key set
    * contains h", so an untouched file provably holds no matching rows.
    * The set-index sidecar carries over untouched files' rows and
    * recomputes rewritten ones (with `keys`/`expectedPerFile`/`fpp` —
    * same parameters as the original commit); prior versions still
    * time-travel to the pre-deletion data until vacuumed (retention is
    * the compliance clock: vacuum after the grace window IS the
    * physical erasure). Requires a set-indexed lineage; zone-map-only
    * lineages would rewrite blind (no targeting) and are refused. */
  def deleteMatching(
      spark: SparkSession, root: String, h: Long,
      pred: org.apache.spark.sql.Column,
      keys: org.apache.spark.sql.Column,
      expectedPerFile: Long, fpp: Double = 0.01,
      statsCols: Seq[String] = Seq.empty,
      sumCols: Seq[String] = Seq.empty): Snapshot = {
    val s = snapshot(spark, root)
    val hitFiles = keptBySet(spark, root, s.version, h)
    if (hitFiles.isEmpty) return s // nothing can match — no new version
    val hitCanon = hitFiles.map(canon).toSet
    val carriedCanon = s.files.map(canon).toSet -- hitCanon
    val untouched = s.files.filterNot(f => hitCanon.contains(canon(f)))
    val survivors = spark.read.parquet(hitFiles: _*)
      .filter(!coalesce(pred, lit(false)))
      .coalesce(hitFiles.size)
    val newFiles = writeFiles(survivors, root)
    val version = s.version + 1
    val all = (untouched ++ newFiles).sorted
    val rows = carrySidecars(spark, root, s.version, version, carriedCanon,
      newFiles, statsCols, sumCols, Some((keys, expectedPerFile, fpp)))
    writeManifest(spark, root, version, all, rows)
  }

  /** RANGE EXPIRY — ClickHouse's `TTL … DELETE` / `DROP PARTITION` on
    * the zone-mapped store: retire every row with `c < cutoff`. The
    * zone maps make this ALMOST FREE on a range-clustered layout —
    * files wholly below the cutoff are simply omitted from the next
    * manifest (a metadata-only drop, no I/O at all; at 100 TB, daily
    * TTL = dropping one day's files from the manifest), files wholly at
    * or above it carry verbatim, and only the straddling boundary files
    * (≤ the cluster overlap, usually 1) rewrite with the residual
    * filter. All-null-`c` files cannot be classified and are rewritten
    * (the filter keeps null-`c` rows — strict `c < cutoff` deletion,
    * same null convention as [[deleteMatching]]). Sidecar rows carry
    * for kept files and recompute for rewritten ones — pass the same
    * `statsCols`/`sumCols` the lineage was committed with (the sidecar
    * union is schema-checked); prior versions time-travel until vacuum,
    * which is the retention/erasure clock. */
  def expireBelow(
      spark: SparkSession, root: String, c: String, cutoff: Any,
      statsCols: Seq[String], sumCols: Seq[String] = Seq.empty,
      setKeys: Option[(org.apache.spark.sql.Column, Long, Double)] = None): Snapshot = {
    require(statsCols.contains(c), s"expiry column '$c' must be a stats column")
    val s = snapshot(spark, root)
    val st = statsTable(spark, root, Some(s.version))
    val mn = col(s"${c}__min")
    val mx = col(s"${c}__max")
    // a whole-file drop must prove EVERY row matches `c < cutoff` —
    // null-c rows are invisible to min/max but kept by the strict-<
    // policy, so any file carrying nulls can at most be rewritten;
    // whole-file keeps are safe with nulls (null rows are kept anyway)
    val parts = st.select(col("file"),
        (mx.isNotNull && mx < lit(cutoff) &&
          col(s"${c}__nulls") === lit(0L)).as("drop"),
        (mn.isNotNull && mn >= lit(cutoff)).as("keep"))
      .collect()
    val keepCanon = parts.filter(_.getAs[Boolean]("keep"))
      .map(r => canon(r.getString(0))).toSet
    // dropped files need no action at all — they are simply absent from
    // the next manifest; boundary = neither kept nor dropped
    val boundarySidecar = parts
      .filter(r => !r.getAs[Boolean]("keep") && !r.getAs[Boolean]("drop"))
      .map(_.getString(0)).toSeq.sorted
    val kept = s.files.filter(f => keepCanon.contains(canon(f)))
    val newFiles =
      if (boundarySidecar.isEmpty) Seq.empty[String]
      else writeFiles(
        spark.read.parquet(boundarySidecar: _*)
          .filter(col(c).isNull || col(c) >= lit(cutoff))
          .coalesce(boundarySidecar.size),
        root)
    val version = s.version + 1
    val all = (kept ++ newFiles).sorted
    val rows = carrySidecars(spark, root, s.version, version, keepCanon,
      newFiles, statsCols, sumCols, setKeys)
    writeManifest(spark, root, version, all, rows)
  }

  /** KEYED UPSERT — the ReplacingMergeTree merge made explicit on the
    * store (the reference's users table IS `ReplacingMergeTree ORDER BY
    * user_id`, `reference/seghouse/warehouse/clickhouse.py:113-117`):
    * batch rows replace same-key stored rows by last-write-wins, new
    * keys insert, and only the files whose set index might contain a
    * batch key are rewritten — O(victim files + batch), never O(table).
    * The per-file test is a multi-probe of the file's Bloom against the
    * batch's distinct key hashes (driver-side, files × batch-keys —
    * metadata × batch, the "batch ≪ table" shape every upsert assumes;
    * the batch's distinct hashes are collected, which is the same
    * bound). Rewrite = LWW over (hit-file rows ∪ batch) via
    * `etl.Dedup.lastWriteWins` — the q14/O-21 semantics; Bloom false
    * positives only widen the rewrite set, and a key in NO file is
    * simply inserted (it rides the union). Batch schema must match the
    * stored schema (unionByName). Prior versions time-travel. */
  def upsertKeyed(
      spark: SparkSession, root: String, batch: DataFrame,
      keyCols: Seq[String], verCol: String,
      tieBreak: Seq[org.apache.spark.sql.Column],
      keys: org.apache.spark.sql.Column,
      expectedPerFile: Long, fpp: Double = 0.01,
      statsCols: Seq[String] = Seq.empty,
      sumCols: Seq[String] = Seq.empty): Snapshot = {
    require(keyCols.nonEmpty, "upsertKeyed needs key columns")
    val s = snapshot(spark, root)
    val idxPath = setIndexDir(root, s.version)
    require(fs(spark, idxPath).exists(idxPath),
      s"snapshot v${s.version} has no set index (upsert needs key targeting — " +
        "use commitWithSetIndex)")
    // the batch's distinct key hashes — bounded by the batch
    val ksDf = batch.select(keys.as("ks"))
    val hashes: Array[Long] = (ksDf.schema("ks").dataType match {
      case org.apache.spark.sql.types.ArrayType(_, _) =>
        ksDf.select(explode(col("ks")).as("h"))
      case _ => ksDf.select(col("ks").as("h"))
    }).filter(col("h").isNotNull).distinct().collect().map(_.getLong(0))
    val sidecar = spark.read.parquet(idxPath.toString)
    val parts = sidecar.select("file", "bloom").collect()
    val hitSidecarFiles = parts.filter(r =>
        graft.plans.BloomSetAgg.mightContainAny(r.getAs[Array[Byte]]("bloom"), hashes))
      .map(_.getString(0)).toSeq.sorted
    val hitCanon = hitSidecarFiles.map(canon).toSet
    val untouched = s.files.filterNot(f => hitCanon.contains(canon(f)))
    val stored =
      if (hitSidecarFiles.isEmpty) batch.filter(lit(false))
      else spark.read.parquet(hitSidecarFiles: _*)
    val resolved = graft.etl.Dedup.lastWriteWins(
      stored.unionByName(batch), keyCols, verCol, tieBreak)
      .coalesce(math.max(1, hitSidecarFiles.size))
    val newFiles = writeFiles(resolved, root)
    val version = s.version + 1
    val all = (untouched ++ newFiles).sorted
    val carriedCanon = s.files.map(canon).toSet -- hitCanon
    val rows = carrySidecars(spark, root, s.version, version, carriedCanon,
      newFiles, statsCols, sumCols, Some((keys, expectedPerFile, fpp)))
    writeManifest(spark, root, version, all, rows)
  }

  /** COMPACTION — the explicit form of ClickHouse's background part
    * merge (MergeTree's whole operating principle, the reference's
    * warehouse): rewrite the current version's data as `targetFiles`
    * files and publish the result as the NEXT version of the same
    * lineage. An append-heavy ingest (q143/q146/appendIndexedBatches)
    * accumulates small files; compaction restores read efficiency and —
    * with `clusterCol` — re-establishes the global sort-key layout that
    * per-batch clustering only approximates (each batch was internally
    * clustered; compaction interleaves them back into tight disjoint
    * ranges, which is exactly what a MergeTree merge does to sorted
    * parts). Costs O(table) I/O by definition; rows are bit-identical.
    * Readers are never disturbed: the old version keeps its files until
    * vacuumed, the new version is one manifest rename away. Sidecars
    * (`statsCols` / `setKeys`) are recomputed for the new layout. */
  def compact(
      spark: SparkSession, root: String, targetFiles: Int,
      clusterCol: Option[String] = None,
      statsCols: Seq[String] = Seq.empty,
      setKeys: Option[(org.apache.spark.sql.Column, Long, Double)] = None,
      sumCols: Seq[String] = Seq.empty): Snapshot = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val s = snapshot(spark, root)
    require(s.files.nonEmpty, s"snapshot v${s.version} has no files to compact")
    val df = spark.read.parquet(s.files: _*)
    val laid = clusterCol match {
      case Some(c) => df.repartitionByRange(targetFiles, col(c))
      case None => df.coalesce(targetFiles)
    }
    if (statsCols.nonEmpty || setKeys.nonEmpty)
      commitIndexed(laid, root, statsCols, setKeys, sumCols)
    else commit(laid, root)
  }

  /** Retire everything but the last `keepLast` snapshots: drops their
    * manifests, then deletes every `data/` subdirectory no kept manifest
    * references — which also sweeps crashed-commit orphans and
    * `.tmp` manifests. Readers of kept snapshots are untouched (their
    * files are never deleted); readers of dropped snapshots race with
    * the delete exactly as they would with any retention policy, which
    * is why `keepLast` exists. Returns the dropped version numbers.
    *
    * In-flight-commit safety (r7 advisor finding): a commit between
    * "data written" and "manifest renamed" looks exactly like a crashed
    * orphan, so a concurrent vacuum could delete its data and the later
    * manifest rename would still succeed — a committed snapshot pointing
    * at nothing. Two guards close the race without coordination:
    * unreferenced dirs YOUNGER than `orphanGraceMs` are skipped (no real
    * commit takes that long between write and rename), and the manifest
    * set is RE-READ after listing so a dir claimed by a manifest
    * committed mid-vacuum is spared regardless of age. Dirs referenced
    * only by DROPPED manifests are retired deliberately and deleted at
    * any age. */
  def vacuum(
      spark: SparkSession,
      root: String,
      keepLast: Int = 1,
      orphanGraceMs: Long = 3600000L
  ): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    require(orphanGraceMs >= 0L, "orphanGraceMs must be >= 0")
    val vs = versions(spark, root)
    val dropped = vs.dropRight(keepLast)
    val kept = vs.takeRight(keepLast)
    def dirsOf(versions: Seq[Int]): Set[String] = versions
      .flatMap(v => snapshot(spark, root, Some(v)).files)
      .map(f => new Path(f).getParent.toString).toSet
    val keptDirs = dirsOf(kept)
    val droppedDirs = dirsOf(dropped) -- keptDirs
    val dataDir = new Path(root, "data")
    val f = fs(spark, dataDir)
    if (f.exists(dataDir)) {
      val candidates = f.listStatus(dataDir).toSeq
        .filterNot(st => keptDirs.contains(st.getPath.toString))
      // re-read AFTER the listing: a manifest committed while we listed
      // may reference a dir that looked orphaned a moment ago (the
      // to-be-dropped manifests don't count — their dirs ARE retired)
      val droppedSet = dropped.toSet
      val nowReferenced = dirsOf(versions(spark, root).filterNot(droppedSet))
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      candidates
        .filterNot(st => nowReferenced.contains(st.getPath.toString))
        .filter(st => droppedDirs.contains(st.getPath.toString) ||
          st.getModificationTime <= cutoff)
        .foreach(st => f.delete(st.getPath, true))
    }
    val mdir = manifestDir(root)
    dropped.foreach { v =>
      f.delete(new Path(mdir, s"v$v.json"), false)
      f.delete(statsDir(root, v), true)    // retired zone-map sidecar
      f.delete(setIndexDir(root, v), true) // retired set-index sidecar
    }
    if (f.exists(mdir)) {
      // .tmp manifests get the same grace as orphan data dirs: a young
      // .tmp may be a commit BETWEEN write and rename — sweeping it would
      // fail that commit's rename (the same race the data-dir grace
      // closes; only crashed commits leave an OLD .tmp behind)
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      f.listStatus(mdir).toSeq
        .filter(st => st.getPath.getName.endsWith(".json.tmp") &&
          st.getModificationTime <= cutoff)
        .foreach(st => f.delete(st.getPath, false))
      // orphan sidecars (stats/set-index written, manifest rename never
      // happened) get the same crashed-commit treatment: invisible to
      // readers, swept once they outlive the grace
      val committed = versions(spark, root).toSet
      f.listStatus(mdir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          n.matches("v\\d+\\.(stats|setidx)") &&
            !committed.contains(
              n.stripPrefix("v").replaceAll("\\.(stats|setidx)$", "").toInt) &&
            st.getModificationTime <= cutoff
        }
        .foreach(st => f.delete(st.getPath, true))
    }
    dropped
  }
}
