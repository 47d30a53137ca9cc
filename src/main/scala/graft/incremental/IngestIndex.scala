package graft.incremental

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{BloomJoin, TextOps}

/** Persisted ingest-probe state: the corpus-side indexes of the delta
  * dedup probes, built ONCE and stored as parquet so each ingest batch
  * pays probe AND absorb cost proportional to the DELTA, not to the
  * corpus.
  *
  * The inline probes ([[TextOps.dedupExactIncremental]] and friends)
  * re-derive their corpus index every call — the right shape for a
  * one-shot check and for the DuckDB oracles, but at 100 TB it re-scans
  * the corpus per batch, the opposite of the reference's watermark
  * discipline (etl_script_incremental_pandas.py:58-96: state survives
  * runs). This class is that discipline applied to the probe indexes:
  *
  *   - `fp/`      (fp_md5 → dup_of)        [[TextOps.dedupExactIndex]]
  *   - `bloom/`   (idx → word)             the fp set as a bitset — KB-scale
  *   - `spans/`   (w)                      [[TextOps.dupSpanIndex]]
  *   - `winnow/`  (fp → capped postings)   [[TextOps.nearDupWinnowIndex]]
  *
  * == LSM layout: absorb appends, compaction folds ==
  *
  * Each index holds a `base/` (hash-bucketed on its key:
  * `bucket = pmod(xxhash64(key), buckets)`, Hive-style `bucket=N`
  * directories) plus zero or more `seg-K/` delta segments. [[absorb]]
  * only ever WRITES NEW SEGMENTS — the delta's own index rows — plus a
  * word-wise OR into the KB-scale bloom (a bloom of a key-set union is
  * the OR of the blooms). Absorb work is therefore ∝ |delta|, flat in
  * corpus size by construction. A bucket-merge absorb would NOT be:
  * uniformly-hashed delta keys touch every bucket as soon as the delta
  * carries more keys than there are buckets, so "rewrite only touched
  * partitions" degenerates to rewriting the whole index on any
  * realistic batch. Appending is the standard LSM answer (RocksDB /
  * Lucene / log-structured tables), and the segment count is bounded:
  * past `maxSegments`, absorb triggers [[compact]].
  *
  * [[compact]] folds the accumulated segments into `base/` and is where
  * the bucketing pays: only the buckets the segment keys land in are
  * merged and swapped (partition-pruned read, per-bucket rename), so
  * SMALL accumulated deltas compact ∝ segment mass; at worst (segments
  * touching every bucket) one amortized index-proportional fold per
  * `maxSegments` batches — never per batch.
  *
  * Probes read `base ∪ segments` with merge-on-read restricted to the
  * DELTA's keys: fp re-mins after the join (delta-sized aggregation),
  * spans is a left-semi against the union (duplicates are free), and
  * winnow re-caps postings only for the fingerprints the incoming batch
  * actually carries — all delta-proportional. Saturation stays exact
  * under the cap because a base posting list only loses doc_ids once it
  * is already saturated, and saturation is monotone (see
  * [[TextOps.nearDupWinnowIndex]]).
  *
  * == Crash safety: one redo journal for the whole batch ==
  *
  * Build/absorb/compact stage EVERY new directory under `.stage/`
  * first, then atomically publish a journal (`_graft_commit`) listing
  * the swaps (whole-dir, per-bucket, or drop), then apply them and
  * retire the journal. Every entry point replays a pending journal
  * before reading ([[recover]]), so a crash at ANY point leaves a state
  * that is either entirely pre-batch or, after the next open, entirely
  * post-batch — the four indexes can never be observed mixed (the S7
  * all-or-nothing discipline, extended to a
  * multi-directory commit). Re-running [[absorb]] with the same batch
  * is idempotent at the result level: a duplicate segment re-mins to
  * the same fp winners, span keys dedup in the semi-join, winnow
  * postings dedup on (fp, doc_id) before re-capping, and the bloom OR
  * is absorbing — duplicate segment rows then vanish at the next
  * compaction.
  *
  * == Single writer ==
  *
  * The journal protocol assumes ONE writer per state directory: the
  * sidecar publish is delete+rename (last-writer-wins), so two
  * processes pointed at the same dir (e.g. two CorpusRun invocations
  * sharing one `SPARK_GRAFT_INGEST_STATE`) could clobber each other's
  * `_graft_commit` and interleave swaps. Concurrent READS (probes) are
  * safe against a quiescent state; concurrent build/absorb/compact are
  * not, and must be serialized by the caller. As a backstop, every
  * published journal carries this instance's writer token and the
  * token is re-checked before the swaps apply — a clobbered journal
  * fails loudly ("concurrent writer detected") instead of silently
  * corrupting state. Best-effort detection, not mutual exclusion.
  *
  * == Self-describing state ==
  *
  * Build parameters (width/stride/k/w/maxDf/bloomBits/bloomK/buckets)
  * are persisted in `_graft_meta` and validated on every open: probing
  * a state directory with mismatched parameters would silently corrupt
  * results (a smaller `bloomBits` yields bloom false negatives, a
  * different `w` different fingerprints), so a mismatch fails loudly
  * instead. `pruneThreshold` and `maxSegments` are runtime cost knobs,
  * not build parameters, and are deliberately not pinned.
  */
final class IngestIndex(spark: SparkSession, dir: String,
    width: Int = 40, stride: Int = 10,
    k: Int = 3, w: Int = 4, maxDf: Int = 100,
    bloomBits: Int = 1 << 20, bloomK: Int = 5,
    pruneThreshold: Long = 5000000L,
    buckets: Int = 32,
    maxSegments: Int = 8,
    withShingles: Boolean = false) {

  /** `withShingles` adds a fifth index `sh/` (doc_id, fp_md5, k-shingle
    * hash array — [[TextOps.shingleSignatures]]): a cache of the
    * DETERMINISTIC per-doc signature the jaccard near-dup stage
    * consumes, so a pipeline re-processing already-admitted docs
    * ([[graft.CorpusRun]] indexed admission) reads their arrays from
    * parquet instead of re-normalizing + re-shingling the text. Batch
    * statistics (df cap, thresholds) always recompute over the batch
    * the arrays are fed into, so results are bit-identical whatever mix
    * of cached and fresh signatures a batch resolves to. Off by default
    * — probe-only states don't pay the storage.
    *
    * The flag means "this caller REQUIRES signature records", not "this
    * state holds them": `sh/` is a superset-compatible CAPABILITY.
    * fp/spans/winnow probes never touch it, so a probe-only caller
    * (withShingles = false) opens a CorpusRun-built shingled state
    * fine, and its absorb/compact keep maintaining `sh/` from the
    * STATE's own capability ([[subs]]) so the cache never goes stale
    * under a mixed-caller workload. Only a caller that needs
    * [[signaturesFor]] rejects a record-less state — loudly, with the
    * rebuild instruction (the records of previously-admitted docs can't
    * be derived from the other indexes; the one upgrade path is a
    * `withShingles = true` rebuild over the FULL admitted corpus). */
  private val AllSubs = Seq("fp", "spans", "winnow", "sh", "shp")

  /** The state's persisted shingle capability (None: no meta yet, or a
    * pre-capability layout). */
  private def storedShingles: Option[Long] = readSidecar(metaPath).flatMap {
    text => text.linesIterator.map(_.trim)
      .collectFirst { case l if l.startsWith("shingles=") =>
        l.stripPrefix("shingles=").trim.toLong }
  }

  /** Does this STATE maintain signature records? The persisted
    * capability when a meta exists (superset-compatible open — see the
    * class doc), the caller's request before the first build. */
  private def effectiveShingles: Boolean =
    storedShingles.map(_ >= 2L).getOrElse(withShingles)

  /** The state's persisted exact-jaccard capability: capability value 3
    * adds the INVERTED shingle postings index `shp/` (shingle →
    * df-capped (doc_id, n_sh) postings) beside the per-doc record cache
    * — what [[jaccardDeltaProbe]] pairs a delta against without ever
    * re-reading corpus text. Older shingled states (value 2) keep
    * serving records; only the jaccard probe demands the upgrade. */
  private def effectiveJaccard: Boolean =
    storedShingles.map(_ >= 3L).getOrElse(withShingles)

  /** The indexes absorb/compact maintain for THIS state. */
  private def subs: Seq[String] = AllSubs.filter {
    case "sh" => effectiveShingles
    case "shp" => effectiveJaccard
    case _ => true
  }

  private def livePath(rel: String) = new Path(s"$dir/$rel")
  private def stagePath(rel: String) = new Path(s"$dir/.stage/$rel")
  private def journalPath = new Path(s"$dir/_graft_commit")
  private def metaPath = new Path(s"$dir/_graft_meta")
  private def fs = journalPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = { recover(); fs.exists(livePath("fp/base")) }

  private def loadBase(sub: String): DataFrame =
    spark.read.parquet(s"$dir/$sub/base")

  /** Segment directory names under `sub`, oldest first. */
  private def segNames(sub: String): Seq[String] =
    if (!fs.exists(livePath(sub))) Nil
    else fs.listStatus(livePath(sub)).map(_.getPath.getName)
      .filter(_.startsWith("seg-")).sortBy(_.drop(4).toInt).toSeq

  private def loadSegs(sub: String): Option[DataFrame] = {
    val names = segNames(sub)
    if (names.isEmpty) None
    else Some(spark.read.parquet(names.map(n => s"$dir/$sub/$n"): _*))
  }

  private def withBucket(df: DataFrame, key: String): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col(key)), lit(buckets.toLong)).cast("int"))

  // ---- tiny sidecar files (atomic single-file write via tmp+rename) ----

  private def writeSidecar(p: Path, content: String): Unit = {
    val tmp = new Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not publish sidecar $p")
  }

  /** Full short-read-safe slurp: `InputStream.read` may return fewer
    * bytes than available (HDFS/S3A do), and a truncated prefix of a
    * number parses successfully — so loop to EOF, always. */
  private def readSidecar(p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val acc = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { acc.write(buf, 0, n); n = in.read(buf) }
        Some(new String(acc.toByteArray, "UTF-8"))
      } finally in.close()
    }

  // ---- row-count stamps (cost-model input for probe-side pruning) ----

  private def rowsPath(sub: String) = new Path(s"$dir/$sub/_graft_rows")
  private def stampRows(sub: String): Unit = {
    val n = loadBase(sub).count() +
      loadSegs(sub).map(_.count()).getOrElse(0L) // parquet footer counts — metadata-cheap
    writeSidecar(rowsPath(sub), n.toString)
  }
  private def indexRows(sub: String): Option[Long] =
    readSidecar(rowsPath(sub)).flatMap(s => scala.util.Try(s.trim.toLong).toOption)

  // ---- build-parameter pinning ----

  private def params: Seq[(String, Long)] = Seq(
    "version" -> 3L, "width" -> width.toLong, "stride" -> stride.toLong,
    "k" -> k.toLong, "w" -> w.toLong, "maxDf" -> maxDf.toLong,
    "bloomBits" -> bloomBits.toLong, "bloomK" -> bloomK.toLong,
    "buckets" -> buckets.toLong,
    // 2 = record schema v2 (shingles + the four quality stats); 3 adds
    // the inverted jaccard postings (shp/). A v1 shingles-only state
    // fails meta validation loudly → rebuild; a v2 state keeps serving
    // records and only [[jaccardDeltaProbe]] demands the v3 rebuild
    "shingles" -> (if (withShingles) 3L else 0L))
  private def validateMeta(): Unit = readSidecar(metaPath) match {
    case None =>
      if (fs.exists(livePath("fp")))
        throw new IllegalStateException(
          s"ingest state at $dir has no _graft_meta (pre-v3 layout?) — rebuild it")
    case Some(text) =>
      val stored = text.linesIterator.map(_.trim).filter(_.nonEmpty)
        .map { l => val Array(n, v) = l.split("=", 2); n -> v.toLong }.toMap
      // everything except `shingles` pins exactly: a mismatched width/w/
      // bloomBits silently corrupts probe results
      val pinned = params.filterNot(_._1 == "shingles")
      val bad = pinned.filter { case (n, v) => stored.get(n).exists(_ != v) } ++
        pinned.filter { case (n, _) => !stored.contains(n) }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"ingest state at $dir was built with different parameters — " +
            bad.map { case (n, v) => s"$n: state=${stored.getOrElse(n, "?")} caller=$v" }
              .distinct.mkString(", ") + " (probing would corrupt results; rebuild or match)")
      // `shingles` is a superset-compatible capability (class doc):
      // reject only a caller that REQUIRES records on a state lacking
      // them — and say how to upgrade (the runbook answer: records are
      // derived from TEXT, so the only path is a full rebuild)
      if (withShingles && !stored.get("shingles").exists(_ >= 2L))
        throw new IllegalStateException(
          s"ingest state at $dir holds no signature records " +
            s"(shingles=${stored.getOrElse("shingles", "absent — pre-r11 state")}) " +
            "but this caller requires them (withShingles = true). Records derive " +
            "from document TEXT, so they cannot be backfilled from the other " +
            "indexes: rebuild the state with withShingles = true over the FULL " +
            "admitted corpus, or point at a fresh state directory.")
  }

  /** One-time open check per instance: replay any torn commit, then pin
    * the build parameters. Every probe/absorb/compact routes through
    * it. */
  private lazy val opened: Unit = { recover(); validateMeta() }

  // ---- staged group commit with a redo journal ----
  //
  // Journal entries are `(relative path, mode)`:
  //   full   replace the live dir with the staged dir wholesale
  //   delta  replace only the bucket=N children present in the stage
  //   drop   delete the live dir (segment retirement at compaction)
  // All three are rename/delete-idempotent: applySwap consumes stage
  // children, so a crash mid-apply leaves exactly the unapplied
  // remainder for recover() to finish.

  /** Per-instance writer token, stamped into every journal this
    * instance publishes. The journal protocol assumes a SINGLE WRITER
    * per state directory (delete+rename sidecar publish is
    * last-writer-wins); the token makes a concurrent writer clobbering
    * our pending journal a LOUD failure instead of silent interleaved
    * corruption — best-effort detection, not mutual exclusion. */
  private val writerToken = java.util.UUID.randomUUID().toString

  private def writeJournal(entries: Seq[(String, String)]): Unit =
    writeSidecar(journalPath,
      (s"#writer $writerToken" +: entries.map { case (s, m) => s"$s $m" })
        .mkString("\n"))

  /** Best-effort concurrent-writer check: the pending journal must
    * still carry OUR token when we go to apply it. A foreign token
    * means another process published a commit between our journal
    * write and apply — state interleaving is imminent, so fail. */
  private[graft] def ownJournalOrThrow(): Unit =
    readSidecar(journalPath).foreach { text =>
      text.linesIterator.find(_.startsWith("#writer ")).foreach { l =>
        val owner = l.stripPrefix("#writer ").trim
        if (owner != writerToken)
          throw new IllegalStateException(
            s"concurrent writer detected on ingest state $dir — journal is " +
              s"owned by $owner, not this instance. The state directory " +
              "requires a single writer; serialize build/absorb/compact calls.")
      }
    }

  private[graft] def applySwap(rel: String, mode: String): Unit = {
    val stage = stagePath(rel)
    val live = livePath(rel)
    mode match {
      case "drop" => fs.delete(live, true)
      case "full" =>
        if (fs.exists(stage)) {
          fs.delete(live, true)
          if (!fs.exists(live.getParent)) fs.mkdirs(live.getParent)
          if (!fs.rename(stage, live))
            throw new java.io.IOException(s"commit: could not publish $stage")
        }
      case "delta" =>
        if (fs.exists(stage)) {
          fs.listStatus(stage).map(_.getPath).filter(_.getName.startsWith("bucket="))
            .foreach { src =>
              val dst = new Path(live, src.getName)
              fs.delete(dst, true)
              if (!fs.rename(src, dst))
                throw new java.io.IOException(s"commit: could not publish $src")
            }
          fs.delete(stage, true) // leftover _SUCCESS etc.
        }
    }
  }

  private def commit(entries: Seq[(String, String)]): Unit = {
    writeJournal(entries)
    ownJournalOrThrow()
    finishCommit(entries)
  }

  /** Package-private so IngestIndexSpec can replay crash points: a
    * prepared journal without the swaps (≙ crash right after the
    * journal published) and a single applied swap (≙ crash mid-apply).
    * Production code only reaches these through [[commit]]/[[recover]]. */
  private[graft] def finishCommit(entries: Seq[(String, String)]): Unit = {
    entries.foreach { case (rel, mode) => applySwap(rel, mode) }
    fs.delete(journalPath, false)
    fs.delete(new Path(s"$dir/.stage"), true)
    // stamp what EXISTS, not what this instance's config expects:
    // recovery may be replaying a foreign-layout journal (e.g. a
    // shingled instance finishing a shingle-less state's torn commit) —
    // the layout question is validateMeta's to answer loudly AFTER
    // recovery, not stampRows' to trip over with a parquet read error
    inParallel(AllSubs.filter(s => fs.exists(livePath(s)))
      .map(s => () => stampRows(s)): _*)
  }

  /** Replay a pending commit (crash between journal publish and journal
    * retire), or clear an abandoned stage (crash before the journal —
    * the batch never happened). Called from every entry point. */
  private def recover(): Unit =
    readSidecar(journalPath) match {
      case Some(text) =>
        val entries = text.linesIterator.map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { l => val Array(s, m) = l.split(" ", 2); (s, m) }.toSeq
        finishCommit(entries)
      case None =>
        fs.delete(new Path(s"$dir/.stage"), true)
    }

  // ---- build ----

  /** Full build from the current corpus — the once-per-corpus pass.
    * Staged and journaled like absorb, so a crashed build leaves either
    * the previous state or the new one, never a mix. The meta file is
    * PART of the journaled commit: a parameter-changing rebuild that
    * crashes mid-stage must not leave new `_graft_meta` beside the old
    * indexes (validateMeta would then silently accept indexes built
    * with different width/w/bloomBits — the exact corruption the
    * pinning exists to fail loudly on). */
  def build(corpus: DataFrame): Unit = {
    val entries = prepareBuild(corpus)
    ownJournalOrThrow()
    finishCommit(entries)
  }

  /** The stage-and-journal half of [[build]] — everything up to (and
    * including) the journal publish, swaps not yet applied.
    * Package-private for IngestIndexSpec's crash-replay tests. */
  private[graft] def prepareBuild(corpus: DataFrame): Seq[(String, String)] = {
    recover() // no meta validation: a rebuild may legitimately change parameters
    // the three indexes derive from the SAME corpus pass — cache the
    // shared scan (disk-backed: at cluster scale the narrow projection
    // still exceeds memory) so fp/spans/winnow each read it once
    // instead of re-scanning + re-parsing the corpus parquet three
    // times, and stage them as CONCURRENT jobs: the writes are
    // independent, so the scheduler overlaps their stages instead of
    // serializing three small shuffles (the same driver-thread pattern
    // works unchanged on a multi-executor cluster).
    val shared = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val jobs = Seq[() => Unit](
        () => {
          stageBucketed("fp/base", withBucket(TextOps.dedupExactIndex(shared), "fp_md5"))
          // the bitset derives from the STAGED fp index (never the
          // corpus): one aggregate over narrow keys
          stageBloom(BloomJoin.bloomFilterBits(
            spark.read.parquet(stagePath("fp/base").toString), "fp_md5", bloomBits, bloomK))
        },
        () => stageBucketed("spans/base", withBucket(TextOps.dupSpanIndex(shared, width, stride), "w")),
        () => stageBucketed("winnow/base", withBucket(TextOps.nearDupWinnowIndex(shared, k, w, maxDf), "fp"))) ++
        (if (withShingles)
          Seq[() => Unit](
            () => stageBucketed("sh/base",
              withBucket(TextOps.shingleSignatures(shared, k), "doc_id")),
            // the INVERTED postings twin: shingle → df-capped postings
            // (cap maxDf+1 — over-cap lists are detectably over, and
            // the probe's size filter drops them exactly like the
            // inline arm's cap over the merged list)
            () => {
              val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
              stageBucketed("shp/base", withBucket(
                TextOps.explodedShingleRows(shared, k)
                  .groupBy(col("shingle"))
                  .agg(capped(col("doc_id"), col("n_sh")).as("ids")),
                "shingle"))
            })
         else Nil)
      inParallel(jobs: _*)
    } finally shared.unpersist(blocking = false)
    writeSidecar(stagePath("_graft_meta"),
      params.map { case (n, v) => s"$n=$v" }.mkString("\n"))
    // build follows the CALLER's capability (a rebuild may upgrade or
    // downgrade it); a downgrade drops the stale sh//shp/ dirs so
    // nothing record-shaped outlives the meta that claimed it
    val shingleSubs = Seq("sh", "shp")
    val builtSubs = if (withShingles) AllSubs
      else AllSubs.filterNot(shingleSubs.contains)
    val entries = builtSubs.map(s => s"$s" -> "full") ++
      (if (withShingles) Nil else shingleSubs.map(_ -> "drop")) ++
      Seq("bloom" -> "full", "_graft_meta" -> "full",
        // a rebuild invalidates any memoized derived frame wholesale
        "pairs" -> "drop")
    writeJournal(entries)
    entries
  }

  /** Run independent staging jobs concurrently (driver threads; Spark's
    * scheduler interleaves their stages). Failures propagate — the
    * journal is only written after ALL stages land, so a failed job
    * leaves an unpublished stage that the next open clears. */
  private def inParallel(jobs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    Await.result(Future.sequence(jobs.map(j => Future(j()))), Duration.Inf)
  }

  private def stageBucketed(rel: String, df: DataFrame): Unit = {
    // label per guide §1.5 — the staging jobs run concurrently from
    // driver threads, so without this the UI/profiler can't tell the
    // five index builds apart (job descriptions are thread-local)
    spark.sparkContext.setJobDescription(s"ingest-index stage $rel")
    // Cluster on the partition column BEFORE the dynamic-partition write
    // (guide §6 small-files rule): without it every input task opens a
    // writer for every bucket value it sees — measured at sf0.1 as an
    // 87 s-of-task-time stage whose cost was ~1000 parquet file
    // creations (32 tasks × 32 buckets), not compute. One keyed exchange
    // of the narrow index rows makes each bucket a single file written
    // by a single task, at any scale.
    df.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(stagePath(rel).toString)
    spark.sparkContext.setJobDescription(null)
  }

  private def stageBloom(words: Array[Long]): Unit = {
    import spark.implicits._
    words.zipWithIndex.map { case (wd, i) => (i, wd) }.toSeq
      .toDF("idx", "word")
      .coalesce(1)
      .write.mode("overwrite").parquet(stagePath("bloom").toString)
  }

  private def bloomWords(): Array[Long] = {
    val rows = spark.read.parquet(s"$dir/bloom").select(col("idx"), col("word")).collect()
    val arr = new Array[Long](bloomBits >> 6)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  // ---- absorb: append-only, work ∝ delta ----

  /** Fold an admitted batch into the state by APPENDING its index rows
    * as new segments (plus a KB-scale bloom OR) — corpus text is never
    * read, existing index files are never rewritten, so absorb wall is
    * flat in corpus size at fixed batch size. Past `maxSegments`
    * accumulated segments, triggers [[compact]] (the amortized fold).
    * Result-equivalent to a full rebuild on the grown corpus AND
    * idempotent under batch re-runs (IngestIndexSpec pins both). */
  def absorb(incoming: DataFrame): Unit = {
    val entries = prepareAbsorb(incoming)
    ownJournalOrThrow()
    finishCommit(entries)
    if (segNames("fp").size >= maxSegments) compact()
  }

  /** The stage-and-journal half of [[absorb]] — everything up to (and
    * including) the commit point, swaps not yet applied. Package-private
    * for IngestIndexSpec's crash-replay tests. */
  private[graft] def prepareAbsorb(incoming: DataFrame): Seq[(String, String)] = {
    opened
    require(fs.exists(livePath("fp/base")), s"no ingest state at $dir — run build first")
    val seg = "seg-" + (segNames("fp").map(_.drop(4).toInt).foldLeft(0)(math.max) + 1)
    val hashed = spansHashed // read the base schema BEFORE forking jobs
    val shared = incoming.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val jobs = Seq[() => Unit](
        () => {
          val deltaFp = TextOps.dedupExactIndex(shared)
          deltaFp.write.parquet(stagePath(s"fp/$seg").toString)
          // bloom(union) = bloom(old) | bloom(delta): KB-scale, absorbing
          stageBloom(bloomWords().zip(
              BloomJoin.bloomFilterBits(deltaFp, "fp_md5", bloomBits, bloomK))
            .map { case (a, b) => a | b })
        },
        () => TextOps.dupSpanIndex(shared, width, stride, hashKey = hashed)
          .write.parquet(stagePath(s"spans/$seg").toString),
        // winnow segments hold RAW (fp, doc_id) pairs — postings re-cap
        // at probe/compact time, so no information is lost at the batch
        // grain
        () => TextOps.docWinnow(shared, k, w)
          .select(col("fp"), col("doc_id")).distinct()
          .write.parquet(stagePath(s"winnow/$seg").toString)) ++
        // the STATE's capability, not the caller's: a probe-only caller
        // absorbing into a shingled state keeps its record cache current
        (if (effectiveShingles)
          Seq[() => Unit](() => TextOps.shingleSignatures(shared, k)
            .write.parquet(stagePath(s"sh/$seg").toString))
         else Nil) ++
        // shp segments hold RAW (shingle, doc_id, n_sh) rows — postings
        // re-cap at probe/compact time, like winnow segments
        (if (effectiveJaccard)
          Seq[() => Unit](() => TextOps.explodedShingleRows(shared, k)
            .select(col("shingle"), col("doc_id"), col("n_sh"))
            .write.parquet(stagePath(s"shp/$seg").toString))
         else Nil)
      inParallel(jobs: _*)
    } finally shared.unpersist(blocking = false)
    val entries = subs.map(s => s"$s/$seg" -> "full") :+ ("bloom" -> "full")
    writeJournal(entries)
    entries
  }

  private def spansHashed: Boolean =
    loadBase("spans").schema("w").dataType == org.apache.spark.sql.types.LongType

  // ---- compaction: fold segments into the bucketed base ----

  /** Merge all accumulated segments into `base/` and retire them, in
    * one journaled commit. Only the hash buckets the segment keys land
    * in are read back (partition-pruned) and swapped — compaction work
    * is ∝ segment mass when segments are small relative to the bucket
    * count, and at worst one index fold per `maxSegments` batches.
    * A no-op when no segments exist. */
  def compact(): Unit = {
    opened
    if (segNames("fp").isEmpty) return
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    val drops = subs.flatMap(sub => segNames(sub).map(n => s"$sub/$n" -> "drop"))
    // the folds are independent — overlap their jobs
    val folds = Seq[() => Unit](
      () => stageCompact("fp", loadSegs("fp").get, "fp_md5", (ex, d) =>
        ex.unionByName(d).groupBy(col("bucket"), col("fp_md5"))
          .agg(min(col("dup_of")).as("dup_of"))),
      () => stageCompact("spans", loadSegs("spans").get, "w",
        (ex, d) => ex.unionByName(d).distinct()),
      () => stageCompact("winnow", loadSegs("winnow").get, "fp", (ex, d) =>
        ex.select(col("bucket"), col("fp"), explode(col("ids")).as("e"))
          .select(col("bucket"), col("fp"), col("e.doc_id").as("doc_id"))
          .unionByName(d)
          .distinct() // duplicate segments (idempotent re-absorb) fold away here
          .groupBy(col("bucket"), col("fp")).agg(capped(col("doc_id"), lit(0)).as("ids")))) ++
      // sh segments may be absent even on a shingled state (e.g. a
      // journal replayed from a mixed history) — fold only what exists
      (if (effectiveShingles && segNames("sh").nonEmpty)
        // sh is deterministic given (doc_id, fp_md5) — duplicate rows
        // from re-absorbed batches carry identical arrays, so keyed
        // dedup (no array comparison) is exact
        Seq[() => Unit](() => stageCompact("sh", loadSegs("sh").get, "doc_id",
          (ex, d) => ex.unionByName(d).dropDuplicates("doc_id", "fp_md5")))
       else Nil) ++
      (if (effectiveJaccard && segNames("shp").nonEmpty)
        // shp folds like winnow: explode base postings to raw rows,
        // union the raw segments, distinct (idempotent re-absorbs fold
        // away; a doc's shingle set is itself distinct), re-cap
        Seq[() => Unit](() => stageCompact("shp", loadSegs("shp").get, "shingle",
          (ex, d) => ex
            .select(col("bucket"), col("shingle"), explode(col("ids")).as("e"))
            .select(col("bucket"), col("shingle"),
              col("e.doc_id").as("doc_id"), col("e.n_sh").as("n_sh"))
            .unionByName(d)
            .distinct()
            .groupBy(col("bucket"), col("shingle"))
            .agg(capped(col("doc_id"), col("n_sh")).as("ids"))))
       else Nil)
    inParallel(folds: _*)
    commit(subs.map(s => s"$s/base" -> "delta") ++ drops)
  }

  /** Stage an index's merged TOUCHED buckets: collect the segments'
    * bucket ids (≤ `buckets` ints), partition-prune the live base to
    * just those, merge, write the staged `bucket=N` dirs. */
  private def stageCompact(sub: String, segRows: DataFrame, key: String,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val delta = withBucket(segRows, key)
    val touched = delta.select(col("bucket")).distinct().collect().map(_.getInt(0))
    val existing = loadBase(sub)
      .filter(col("bucket").isin(touched.map(b => b: java.lang.Integer): _*))
    // same §6 pre-clustering as stageBucketed: one task/file per bucket
    // instead of every-task-opens-every-bucket dynamic-partition fanout
    merge(existing, delta).repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(stagePath(s"$sub/base").toString)
  }

  // ---- probes: merge-on-read over base ∪ segments, work ∝ delta ----
  //
  // Past `pruneThreshold` index rows, each probe prunes the INDEX scan
  // with a bitset of the DELTA's keys before the join: a batch is
  // small, so its bloom is KB-scale and rides the plan as a literal,
  // evaluated row-locally while the index files stream — index rows
  // that cannot match never reach the join, collapsing the join's
  // shuffle to ≈ true hits + the fp tail (delta-proportional) instead
  // of index-proportional. One columnar, shuffle-free index SCAN
  // remains — the floor for a persisted index without key-partition
  // pruning at probe time. The decision is COST-BASED from the
  // persisted row stat (one driver FS read, no job): below the
  // threshold the bloom build's extra aggregate+collect jobs cost more
  // than the small join they save (measured: the unconditional form
  // doubled the sf0.1 warm probe, 2.1 → 4.2 s, while changing nothing
  // at 100 TB where the index shuffle dominates). No false negatives
  // either way, so results stay bit-identical to the inline operators
  // (IngestIndexSpec pins both regimes via a pruneThreshold = 0 twin).

  private def deltaPruned(index: DataFrame, deltaKeys: => DataFrame,
      key: String, sub: String): DataFrame =
    if (!indexRows(sub).exists(_ >= pruneThreshold)) index
    else {
      val bits = BloomJoin.bloomFilterBits(deltaKeys, key, bloomBits, bloomK)
      index.filter(BloomJoin.mightContain(bits, col(key), bloomBits, bloomK))
    }

  /** fp index view: base ∪ segments. Duplicate keys are possible while
    * segments exist — [[dedupExactProbe]] re-mins AFTER its join (a
    * delta-sized aggregation), so results match the consolidated
    * index exactly. */
  private def fpIndex: DataFrame = {
    val base = loadBase("fp").drop("bucket")
    loadSegs("fp").fold(base)(segs => base.unionByName(segs))
  }

  /** Read-only snapshot of the corpus fingerprint keys (base ∪ the
    * segments visible right now) — the stream-static side of
    * [[graft.streaming.DocStream.dropAdmitted]], re-opened per
    * micro-batch so a mid-stream [[absorb]] becomes visible at the next
    * batch. Deliberately does NOT replay a pending journal: recovery is
    * a WRITE, and this reader may run concurrently with the single
    * writer — an in-flight absorb's segments appear only once its
    * commit applies, so the read is always a committed prefix of the
    * state (validateMeta still pins the build parameters). */
  def corpusFpsSnapshot: DataFrame = {
    validateMeta()
    fpIndex.select(col("fp_md5"))
  }

  /** [[TextOps.dedupExactIncremental]] against the persisted index. */
  def dedupExactProbe(incoming: DataFrame): DataFrame =
    dedupExactProbeFp(incoming.select(col("doc_id"),
      graft.functions.TextFns.fingerprint(col("text")).as("fp_md5")))

  /** [[dedupExactProbe]] over an ALREADY-FINGERPRINTED (doc_id, fp_md5)
    * frame — a pipeline that fingerprints its batch once (CorpusRun's
    * shared signature frame) probes without re-normalizing the text. */
  def dedupExactProbeFp(sig: DataFrame): DataFrame = {
    opened
    sig.select(col("doc_id"), col("fp_md5"))
      .join(deltaPruned(fpIndex, sig.select(col("fp_md5")), "fp_md5", "fp"), Seq("fp_md5"))
      .groupBy(col("doc_id"), col("fp_md5")).agg(min(col("dup_of")).as("dup_of"))
      .select(col("doc_id"), col("fp_md5"), col("dup_of"))
  }

  /** [[TextOps.dedupExactIncrementalBloom]] against the persisted
    * index + bitset — BOTH sides prefilter row-locally: the corpus
    * bitset kills clean delta rows at the delta scan, the delta bitset
    * kills non-matching index rows at the index scan. */
  def dedupExactProbeBloom(incoming: DataFrame): DataFrame = {
    opened
    val keys = TextOps.dedupExactIndex(incoming).select(col("fp_md5"))
    TextOps.dedupExactProbeBloom(bloomWords(),
      deltaPruned(fpIndex, keys, "fp_md5", "fp"), incoming, bloomBits, bloomK)
      .groupBy(col("doc_id"), col("fp_md5")).agg(min(col("dup_of")).as("dup_of"))
      .select(col("doc_id"), col("fp_md5"), col("dup_of"))
  }

  /** [[TextOps.docDupSpansIncremental]] against the persisted key set.
    * The probe's semi-join tolerates duplicate keys, so the segment
    * union needs no dedup at all. */
  def dupSpansProbe(incoming: DataFrame): DataFrame = {
    opened
    val base = loadBase("spans").drop("bucket")
    val idx = loadSegs("spans").fold(base)(segs => base.unionByName(segs))
    val hashed = idx.schema("w").dataType == org.apache.spark.sql.types.LongType
    val keys = TextOps.dupSpanIndex(incoming, width, stride, hashKey = hashed)
    TextOps.docDupSpansProbe(deltaPruned(idx, keys, "w", "spans"), incoming, width, stride)
  }

  /** [[TextOps.nearDupWinnowIncremental]] against the persisted
    * postings. With segments live, postings re-cap ONLY for the
    * fingerprints the incoming batch carries (an inner join against the
    * delta's key set restricts the explode-union-recap to a delta-sized
    * frame) — saturation decisions come out identical to the
    * consolidated index because base lists only lose doc_ids once
    * already saturated, and saturation is monotone under union. */
  def winnowProbe(incoming: DataFrame, minShared: Int = 2): DataFrame = {
    opened
    val keys = TextOps.docWinnow(incoming, k, w).select(col("fp")).distinct()
    val base = loadBase("winnow").drop("bucket")
    val idx = loadSegs("winnow") match {
      case None => base
      case Some(segs) =>
        val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
        base.join(keys, Seq("fp"))
          .select(col("fp"), explode(col("ids")).as("e"))
          .select(col("fp"), col("e.doc_id").as("doc_id"))
          .unionByName(segs.join(keys, Seq("fp")))
          .distinct()
          .groupBy(col("fp")).agg(capped(col("doc_id"), lit(0)).as("ids"))
    }
    TextOps.nearDupWinnowProbe(deltaPruned(idx, keys, "fp", "winnow"),
      incoming, k, w, minShared, maxDf)
  }

  /** EXACT-jaccard delta near-dup against the persisted inverted
    * postings (`shp/`): pairs touching `incoming` (new×old and
    * new×new), bit-identical to the inline
    * [[graft.ops.TextOps.nearDupJaccardIncremental]] over (admitted
    * corpus, incoming) — the two arms share the posting-cap algebra and
    * the pair-emit tail, so one DuckDB oracle covers both. The
    * difference is WORK SHAPE: the inline arm re-reads, re-parses, and
    * re-shingles the whole corpus TEXT per batch (corpus-proportional
    * in the expensive dimension); this probe pays one NARROW columnar
    * scan of the postings index (bloom row-pruned at the scan past
    * `pruneThreshold`), and everything after the delta-shingle
    * semi-join is ∝ the delta's shingle mass × O(maxDf) — the same
    * index-proportional floor the other probes document, soak-bounded
    * at ≤2x between a 1x- and a 10x-corpus state. The 100-TB
    * ingest-time path.
    *
    * Cap exactness across the split: stored postings cap at maxDf+1, so
    * an under-cap list is the EXACT corpus list and an at-cap list is
    * detectably over once merged with ≥1 delta occurrence — and a
    * shingle with no delta occurrence never enters the probe at all —
    * so the merged re-cap reproduces the inline arm's df∈[2,maxDf]
    * semantics on every shingle the result can depend on. */
  def jaccardDeltaProbe(incoming: DataFrame,
      minJaccard: Double = 0.8): DataFrame = {
    opened
    require(effectiveJaccard,
      s"ingest state at $dir holds no jaccard postings (shp/) — rebuild the state " +
        "with withShingles = true over the FULL admitted corpus to enable the " +
        "indexed exact-jaccard delta probe")
    val exInc = TextOps.explodedShingleRows(incoming, k)
    val keys = exInc.select(col("shingle")).distinct()
    // corpus postings restricted to the delta's shingles: bloom
    // row-prune at the scan (cost-gated), then the exact semi-join the
    // inline arm's correctness argument requires
    val base = deltaPruned(loadBase("shp").drop("bucket"), keys, "shingle", "shp")
      .join(keys, Seq("shingle"), "left_semi")
      .select(col("shingle"), explode(col("ids")).as("e"))
      .select(col("shingle"), col("e.doc_id").as("doc_id"), col("e.n_sh").as("n_sh"))
    val corpusRaw = loadSegs("shp") match {
      case None => base
      case Some(segs) =>
        // segments are raw rows; duplicates (idempotent re-absorbs)
        // fold away in the distinct, like the winnow probe's merge
        base.unionByName(segs.join(keys, Seq("shingle"), "left_semi")
          .select(col("shingle"), col("doc_id"), col("n_sh"))).distinct()
    }
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    val postings = corpusRaw
      .unionByName(exInc.select(col("shingle"), col("doc_id"), col("n_sh")))
      .groupBy(col("shingle"))
      .agg(capped(col("doc_id"), col("n_sh")).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    TextOps.jaccardPairsTouching(postings,
      incoming.select(col("doc_id")).distinct(), minJaccard)
  }

  /** Signature records for `incoming` with cache reuse: docs whose
    * (doc_id, fp_md5) the state already holds read their record — the
    * k-shingle array PLUS the four quality stats — from the persisted
    * `sh/` index (a columnar parquet read); only docs the state has
    * never seen pay the normalize + tokenize + shingle + stats pass.
    * Returns (doc_id, fp_md5, sh, n_tokens, stopword_ratio,
    * punct_ratio, digit_ratio) covering EVERY incoming doc — feed `sh`
    * to [[TextOps.nearDupJaccardSh]] and the stats to
    * [[TextOps.docQualityStats]]/[[TextOps.docQualityLogregStats]]:
    * batch statistics (df cap, gradients) recompute over this batch,
    * so results are bit-identical to a fresh scan of the same docs
    * (IngestIndexSpec). An all-resubmission batch (a pipeline re-run)
    * reduces to a fingerprint pass + a pure index read. */
  def signaturesFor(incoming: DataFrame): DataFrame =
    signaturesForSig(incoming.select(col("doc_id"),
      graft.functions.TextFns.fingerprint(col("text")).as("fp_md5"), col("text")))

  /** [[signaturesFor]] over an ALREADY-FINGERPRINTED (doc_id, fp_md5,
    * text) frame — skips the normalize+md5 pass for callers that
    * fingerprinted the batch once already. */
  def signaturesForSig(sig: DataFrame): DataFrame = {
    opened
    require(effectiveShingles,
      s"ingest state at $dir holds no signature records — rebuild with withShingles = true")
    val recCols = Seq("sh", "n_tokens", "stopword_ratio", "punct_ratio", "digit_ratio")
    val outCols = (Seq("doc_id", "fp_md5") ++ recCols).map(col) :+ col("cached")
    val base = loadBase("sh").drop("bucket")
    val segs = loadSegs("sh")
    val idx = segs.fold(base)(s => base.unionByName(s))
    // ONE text scan total: the narrow (doc_id, fp_md5) keys materialize
    // off the fingerprint pass once (localCheckpoint), and BOTH union
    // branches read that instead of re-deriving md5 from text per
    // branch — the pre-r12 shape evaluated the fingerprint scan twice
    // (hits and misses are separate subplans of the union; Spark does
    // not share them), which is exactly what cost the warm indexed
    // funnel its win over the inline one in the r12 soak A/B. The hits
    // join still moves keys only against the index (never text); the
    // MISS side re-attaches text by a doc_id semi-join — delta-sized,
    // and on a full re-run (no misses) AQE's empty-relation propagation
    // collapses that docs scan outright.
    val ids = sig.select(col("doc_id"), col("fp_md5")).localCheckpoint()
    val pruned = deltaPruned(idx, ids.select(col("fp_md5")), "fp_md5", "sh")
    // duplicate (doc_id, fp) rows are possible only while segments
    // exist — records are identical by determinism, so a keyed dedup
    // AFTER the join (delta-sized) restores uniqueness; a compacted
    // base is unique by construction and skips the extra shuffle
    val joined = ids.join(pruned, Seq("doc_id", "fp_md5"))
    val hits = segs.fold(joined)(_ => joined.dropDuplicates("doc_id"))
      .withColumn("cached", lit(1))
      .select(outCols: _*)
    val missIds = ids.join(pruned.select("doc_id", "fp_md5"),
      Seq("doc_id", "fp_md5"), "left_anti").select("doc_id")
    val fresh = TextOps.shingleSignatures(
        sig.select(col("doc_id"), col("text"))
          .join(missIds, Seq("doc_id"), "left_semi"), k)
      .withColumn("cached", lit(0))
      .select(outCols: _*)
    hits.unionByName(fresh)
  }

  // ---- memoized derived frames ----
  //
  // A batch-statistic frame (the near-dup pair frame: df caps, jaccard
  // — all functions of the doc SET it was computed over) can't live in
  // the per-doc indexes, but it CAN be memoized keyed by an exact
  // set-identity tag: a re-run over the identical admitted set (the
  // common "re-crawl with nothing new" case) replays the stored frame
  // bit-for-bit instead of re-pairing the corpus. Any change to the
  // set changes the tag, so a stale memo is simply ignored — and a
  // rebuild drops it outright.

  /** Order-independent identity tag of a (doc_id, fp_md5) doc set:
    * count + XOR + sum over TWO independently-seeded 64-bit row hashes
    * (the second hash mixes a salt literal into xxhash64, so its
    * collisions are independent of the first's). Equal sets ⇒ equal
    * tags. Unequal sets: for RANDOM collisions the 4 independent 64-bit
    * combiners put a false match far below any operational concern;
    * no formal bound is claimed against ADVERSARIALLY structured set
    * differences (count+xor+sum is not a cryptographic accumulator) —
    * the memo guards a pipeline against its own re-runs, not against an
    * attacker, and a rebuild drops it outright. One tiny fused
    * aggregation (KB to the driver).
    *
    * Callers memoizing a frame that also depends on OPERATOR PARAMETERS
    * must fold those into the key themselves (e.g. [[graft.CorpusRun]]
    * appends [[TextOps.nearDupJaccardParamsTag]]) — a parameter-default
    * change must never replay a frame computed under the old defaults
    * over an unchanged doc set. */
  def docSetTag(ids: DataFrame): String = {
    val r = ids
      .select(xxhash64(col("doc_id"), col("fp_md5")).as("h1"),
        xxhash64(lit("graft-set-tag-2"), col("doc_id"), col("fp_md5")).as("h2"))
      .selectExpr("count(1) as n",
        "bit_xor(h1) as x1", "sum(cast(h1 as decimal(28,0))) as s1",
        "bit_xor(h2) as x2", "sum(cast(h2 as decimal(28,0))) as s2")
      .collect()(0)
    (0 to 4).map(r.get).mkString(":")
  }

  /** Memoize a derived pair frame computed over the EXACT doc set
    * identified by `tag` — staged + journaled like every other commit
    * (a crash leaves either the old memo or the new one, never a
    * torn read). */
  def putPairs(tag: String, pairs: DataFrame): Unit = {
    opened
    pairs.write.mode("overwrite").parquet(stagePath("pairs/data").toString)
    val out = fs.create(stagePath("pairs/_graft_tag"), true)
    try out.write(tag.getBytes("UTF-8")) finally out.close()
    commit(Seq("pairs" -> "full"))
  }

  /** The memoized pair frame, iff it was computed over exactly the doc
    * set identified by `tag`; None on any mismatch (different set,
    * no memo yet, dropped by a rebuild). */
  def getPairs(tag: String): Option[DataFrame] = {
    opened
    readSidecar(new Path(s"$dir/pairs/_graft_tag"))
      .filter(_.trim == tag)
      .map(_ => spark.read.parquet(s"$dir/pairs/data"))
  }
}
