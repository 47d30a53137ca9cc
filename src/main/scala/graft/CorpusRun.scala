package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Direct-run entry for the corpus-curation pipeline — the LLM-data
  * analogue of [[IncrementalRun]]: one pass over a documents table
  * producing a training-ready kept corpus plus its audit artifacts.
  *
  * Usage: runMain graft.CorpusRun <sfDir> <outDir>
  *
  * Stages (each stage's survivor count prints as a `[corpus]` line and
  * lands in `report.parquet` — the lineage a curator reads before
  * shipping):
  *   1. quality gate     — [[TextOps.docQuality]] rule score ≥ 3/4 AND
  *                         the distilled [[TextOps.docQualityLogreg]]
  *                         model agrees (belt and braces: the model
  *                         catches rule-boundary artifacts, the rules
  *                         catch model drift);
  *   2. exact dedup      — canonical-md5 keeper;
  *   3. near-dup dedup   — [[TextOps.nearDupKeepBest]] (quality-aware
  *                         transitive-cluster keeper);
  *   4. decontamination  — drop corpus docs sharing ≥ `minCollisions`
  *                         5-gram shingles with the eval slice;
  *   5. split assignment — deterministic md5 train/val/test;
  *   6. PSI gate         — [[TextOps.splitDriftPsi]] must sit inside
  *                         the no-shift band (`SPARK_GRAFT_PSI_MAX`,
  *                         default 0.1) or the run aborts (exit 2)
  *                         BEFORE anything is published.
  *
  * Outputs under `outDir`: `kept/` (doc_id, split, quality columns),
  * `report.parquet` (stage, n_docs), `psi.parquet`. Publication is
  * all-or-nothing: artifacts are written only after every gate passes,
  * so a failed run leaves no half-corpus behind.
  *
  * `SPARK_GRAFT_INGEST_STATE=<dir>` switches stage 2 to INDEXED
  * ADMISSION: the batch probes the persisted
  * [[graft.incremental.IngestIndex]] for fingerprints earlier runs
  * already admitted (work ∝ batch, never ∝ corpus) and, after
  * publication, absorbs its admitted slice back (segment append). The
  * funnel's output stays identical to the batch form on id-ordered
  * batch sequences, and re-running a batch is a no-op — CorpusRunSpec
  * pins both. The state directory is SINGLE-WRITER: don't point two
  * concurrent CorpusRun invocations at the same
  * `SPARK_GRAFT_INGEST_STATE` (the index's journal detects a clobbered
  * commit and fails loudly, but serialization is the caller's job —
  * see [[graft.incremental.IngestIndex]]).
  */
object CorpusRun {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // gates and modes read system properties first so an embedding spec
    // can toggle them per-run without mutating the process environment
    def flag(k: String): Option[String] = sys.props.get(k).orElse(sys.env.get(k))
    val psiMax = flag("SPARK_GRAFT_PSI_MAX").getOrElse("0.1").toDouble
    // embeddable main: when a session already exists (a spec driving
    // the pipeline), reuse it UNTOUCHED ([[RunSession]]) and leave its
    // lifecycle to the owner
    val (spark, owned) = RunSession.obtain()
    GraftSession.install(spark)

    val docs = Tables.documents(spark, sfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var lastStageAt = System.nanoTime()
    def stage(name: String, n: Long): Unit = {
      stages += ((name, n))
      val now = System.nanoTime()
      println(f"[corpus] $name -> $n docs  (+${(now - lastStageAt) / 1e9}%.2f s)")
      lastStageAt = now
    }
    stage("input", docs.count())

    // 0. ONE signature-record pass over the input — (fp_md5, shingles,
    // four quality stats), all deterministic row-local values — feeds
    // EVERY per-doc consumer below: the rules gate, the logreg features
    // (each GD action then scans this small checkpointed frame, not the
    // corpus), the within-batch dedup, the state probe, and the
    // near-dup pair frame. The funnel used to pay a tokenize+regex scan
    // per consumer. In warm indexed mode ([[graft.incremental
    // .IngestIndex.signaturesFor]]) only the fingerprint pass touches
    // the text — records of already-admitted docs come back as a
    // columnar index read, so a full re-run never re-tokenizes.
    val ingestState = flag("SPARK_GRAFT_INGEST_STATE")
      .map(dir => new graft.incremental.IngestIndex(spark, dir, withShingles = true))
    val warmState = ingestState.filter(_.exists)
    // warm records come out of a join∪scan plan (shuffle-partitioned);
    // coalesce to the INPUT's partition grain before checkpointing so
    // every downstream stage schedules the same number of tasks as the
    // plain path's narrow-scan records (input partitions scale with
    // data). FLOOR at the session parallelism: a single-row-group input
    // reads as ONE partition, and coalesce(1) was single-threading every
    // downstream stage of the warm indexed run — the same §2.5
    // parallelism hole Par.fanned repairs for the plain path (measured:
    // indexed warm 11.0 s vs inline 9.9 s at sf0.1, inverted from the
    // crossover the index exists to win).
    val inParts = math.max(spark.sparkContext.defaultParallelism,
      docs.rdd.getNumPartitions)
    val records = (warmState match {
      case Some(idx) =>
        println("[corpus] signatures: persisted ingest state (fingerprint-only text scan)")
        idx.signaturesFor(docs).coalesce(inParts)
      case None => TextOps.shingleSignatures(docs)
    }).localCheckpoint()

    // 1. quality: rules AND the distilled model must both pass — both
    // scored from the shared records. The rule-score frame feeds three
    // consumers (this gate, the keep-best keeper, the publish join).
    val quality = TextOps.docQualityStats(records)
      .select(col("doc_id"), col("quality_score"))
    val rulesPass = quality
      .filter(col("quality_score") >= 0.75).select("doc_id")
    val modelPass = TextOps.docQualityLogregStats(records)
      .filter(col("label_pred") === 1).select("doc_id")
    val q = docs.join(rulesPass, Seq("doc_id"), "left_semi")
      .join(modelPass, Seq("doc_id"), "left_semi")
    stage("quality_gate", q.count())

    // 2-3. exact then near-dup (quality-aware keeper); both operators
    // compute over the quality-surviving slice only. The near-dup PAIR
    // frame materializes ONCE (localCheckpoint, the pagerank-edges
    // discipline) and every similarity consumer downstream — keeper,
    // cluster-aware splitter, leakage audit — derives from it instead
    // of re-running the shingle/inverted-index machinery per stage.
    //
    // Exact dedup has two modes. Default: the batch keeper over this
    // run's input. Gated (SPARK_GRAFT_INGEST_STATE=<dir>, the excision-
    // gate pattern): INDEXED ADMISSION against the persisted
    // [[graft.incremental.IngestIndex]] — the batch still dedups within
    // itself, then drops docs whose fingerprint an EARLIER run already
    // admitted (probe work ∝ batch, the corpus is never rescanned), and
    // after every gate passes the admitted slice is absorbed back into
    // the state (segment append, ∝ batch). A re-submitted identical doc
    // keeps itself (its fp maps to its own doc_id), so re-running a
    // batch is a no-op rather than a self-eviction — and the funnel's
    // published output is IDENTICAL to the batch form on any id-ordered
    // batch sequence (CorpusRunSpec pins both properties).
    // the fingerprint slice of the shared records, restricted to the
    // quality survivors (keeper-ship is decided among survivors only)
    val sig = records.select(col("doc_id"), col("fp_md5"))
      .join(q.select("doc_id"), Seq("doc_id"), "left_semi")
    val withinBatch = q.join(
      sig.groupBy(col("fp_md5")).agg(min(col("doc_id")).as("doc_id")),
      Seq("doc_id"), "left_semi")
    // `stateHitIds` = batch docs whose fingerprint the state already
    // holds (the probe's inner join emits exactly those): re-submitted
    // keepers plus cross-run dupes. Its complement within the admitted
    // slice is the GENUINELY-NEW content — the only slice absorb needs
    // (the state already carries every index row of a re-submitted
    // doc), which makes a full re-run's absorb a no-op.
    // stateHitIds: None = no state; Some(None) = state, nothing new
    // (absorb is a guaranteed no-op); Some(Some(ids)) = state + new
    // content, ids are the already-admitted slice to exclude from absorb
    val (exact, stateHitIds) = warmState match {
      case Some(idx) =>
        println("[corpus] exact dedup: indexed admission (persisted ingest state)")
        // A `cached` record (sh-index hit on (doc_id, fp_md5)) proves
        // this exact doc was previously ADMITTED as its own keeper — it
        // can never be a cross-run dupe, so the fp probe only needs to
        // run over the sh-MISS slice (new or changed docs). On a full
        // re-run that slice is empty: admission costs one keys-only
        // index join, zero fp probes.
        // cheap lineage (projections off the records checkpoint +
        // broadcast semi-joins) — evaluated inside the admitted frame's
        // checkpoint and once more at absorb time; its own checkpoint
        // action costs more than both evaluations
        val cachedIds = records.filter(col("cached") === 1).select("doc_id")
          .join(withinBatch.select("doc_id"), Seq("doc_id"), "left_semi")
        // a full re-run has no misses at all — one early-out scan of the
        // checkpointed records skips the probe plan (fp-index read + two
        // anti-joins) entirely. count(), not isEmpty: proving emptiness
        // via take(1) ramps 1 → 4 → all partitions as three sequential
        // mini-jobs over the wide checkpoint rows (~1 s at ×10 sf0.1,
        // measured in the r12 soak A/B); one all-partitions count is a
        // single parallel pass
        val hasNew = records.filter(col("cached") === 0).count() > 0
        if (!hasNew) (withinBatch, Some(None))
        else {
          // no checkpoint on the probe: its single consumer is the
          // admitted frame, which checkpoints immediately below — the
          // probe folds into that one action
          val probe = idx.dedupExactProbeFp(
              sig.join(withinBatch.select("doc_id"), Seq("doc_id"), "left_semi")
                .join(cachedIds, Seq("doc_id"), "left_anti"))
            .select(col("doc_id"), col("dup_of"))
          val dupes = probe.filter(col("dup_of") =!= col("doc_id")).select("doc_id")
          (withinBatch.join(dupes, Seq("doc_id"), "left_anti"), Some(Some(cachedIds)))
        }
      case None => (withinBatch, None)
    }
    // Every downstream stage (pair frame, keeper, decontamination,
    // splits, publish — and in gated mode the probe/absorb actions too)
    // re-drives the admitted frame; without a checkpoint each action
    // re-evaluates the whole quality funnel above, re-TRAINING the
    // distilled logreg per action. Same localCheckpoint discipline as
    // the pair frame — measured at sf0.001: warm gated run 35.9 → 15.9 s,
    // and the plain batch funnel 23.1 → ~17 s from the same cut.
    val exactStable = exact.localCheckpoint()
    stage("exact_dedup", exactStable.count())
    // Near-dup pair frame from the shared records (the batch's df cap
    // and jaccard thresholds recompute over the admitted slice, so the
    // pair frame equals what fresh shingling of the same docs yields).
    // The pair frame is a pure function of the admitted doc SET, so the
    // ingest state memoizes it keyed by an exact set-identity tag
    // ([[graft.incremental.IngestIndex.docSetTag]]): a re-run over an
    // unchanged corpus — the dominant production case — replays the
    // stored frame instead of re-pairing, turning the funnel's most
    // expensive stage into a parquet read. Any admitted-set change
    // misses the tag and recomputes exactly as before.
    val admittedSig = sig.join(exactStable.select("doc_id"), Seq("doc_id"), "left_semi")
    // memo key = exact doc-set identity PLUS the pair operator's
    // parameters: a jaccard/df-cap default change misses the memo and
    // recomputes instead of replaying a frame built under old defaults
    val pairsTag = warmState.map(idx =>
      idx.docSetTag(admittedSig) + "|" + TextOps.nearDupJaccardParamsTag())
    val pairsMemo = warmState.zip(pairsTag)
      .flatMap { case (idx, tag) => idx.getPairs(tag) }
    val pairs = pairsMemo match {
      case Some(stored) =>
        println("[corpus] near-dup pairs: memoized pair frame (persisted ingest state)")
        stored.localCheckpoint()
      case None => TextOps.nearDupJaccardSh(
          records.join(exactStable.select("doc_id"), Seq("doc_id"), "left_semi"))
        .localCheckpoint()
    }
    val clusterFrame = TextOps.clustersFromPairs(pairs)
      .select(col("doc_id"), col("cluster_id")).localCheckpoint()
    val keptDocs = exactStable.join(
      TextOps.nearDupKeepBest(exactStable, precomputedClusters = Some(clusterFrame),
          precomputedQuality = Some(quality))
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    stage("neardup_keep_best", keptDocs.count())

    // 3b (gated: SPARK_GRAFT_EXCISE=1). Doc-grain dedup keeps ONE of two
    // near-identical docs; span excision additionally strips exact
    // cross-doc passages the survivors still share (Lee et al.'s
    // keep-one-copy, applied to the kept slice). Text is rewritten to
    // the stitched normalized form — downstream stages normalize anyway,
    // so semantics are unchanged for them. Default OFF: the published
    // corpus keeps original text unless the operator is asked for.
    val kept =
      if (!flag("SPARK_GRAFT_EXCISE").contains("1")) keptDocs
      else {
        val ex = TextOps.docDupExciseText(keptDocs)
        val removed = ex.agg(org.apache.spark.sql.functions.sum(col("removed_chars")))
          .head.getLong(0)
        println(s"[corpus] excise -> $removed dup chars removed")
        // left join: sub-width docs are below span resolution and keep
        // their original text
        keptDocs
          .join(ex.select(col("doc_id"), col("clean")), Seq("doc_id"), "left")
          .withColumn("text", coalesce(col("clean"), col("text")))
          .drop("clean")
      }
    if (flag("SPARK_GRAFT_EXCISE").contains("1"))
      stage("excised", kept.count())

    // 4. decontamination vs the held-out eval slice (doc_id % 10 == 0,
    // the same convention as the decontaminate driver query)
    val clean = kept.join(
      TextOps.decontaminate(
        kept, docs.filter(col("doc_id") % 10 === 0))
        .filter(col("contaminated") === 0).select("doc_id"),
      Seq("doc_id"), "left_semi")
    stage("decontaminated", clean.count())

    // 5. splits + 6. PSI drift gate BEFORE publication. The splitter is
    // selectable (SPARK_GRAFT_SPLIT=cluster): cluster-grain keys make
    // near-dup leakage across splits structurally zero (splitLeakage is
    // the detector that motivates it); default stays the id-hash
    // assignment the driver queries pin.
    val clusterMode = flag("SPARK_GRAFT_SPLIT").contains("cluster")
    val splitter =
      if (clusterMode) {
        println("[corpus] splitter: cluster-aware")
        // keys come from the SHARED cluster frame (computed on the
        // pre-excision kept slice): a coarser grouping than re-running
        // similarity on the published text, which only ever merges more
        // docs into one split — leakage stays structurally zero and the
        // second full jaccard+CC pass disappears
        TextOps.splitAssignClusterAware(clean, precomputedClusters = Some(clusterFrame))
      } else TextOps.splitAssign(clean)
    val withSplit = splitter.select(col("doc_id"), col("split"))
    if (clusterMode) {
      // leakage audit from the SAME pair frame: a near-dup pair with
      // both members surviving must share a split by construction
      val leaked = pairs
        .join(withSplit.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
        .join(withSplit.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
        .filter(col("sa") =!= col("sb")).count()
      println(s"[corpus] leakage audit -> $leaked cross-split near-dup pairs")
      if (leaked != 0)
        throw new IllegalStateException(
          s"cluster-aware splitter leaked $leaked near-dup pairs across splits")
    }
    val psi = TextOps.splitDriftPsi(clean)
    val psiRows = psi.collect().map(r => (r.getString(0), r.getDouble(1)))
    psiRows.foreach { case (split, v) => println(f"[corpus] psi $split%-5s $v%.6f") }
    val worst = psiRows.map(_._2).maxOption.getOrElse(0.0)
    if (worst > psiMax) {
      System.err.println(
        s"[corpus] PSI gate FAILED: max $worst > $psiMax — nothing published")
      if (owned) spark.stop()
      sys.exit(2)
    }

    // publish: gates green, write everything. The STORE OF RECORD is a
    // doc_id-keyed [[graft.incremental.SnapshotTable]] at `corpus/` —
    // versioned, atomically committed, and the substrate the
    // right-to-be-forgotten pass ([[CorpusForget]]) operates on: a
    // keyed DELETE there rewrites only the files whose doc_id range
    // holds a doomed id, then retire+vacuum reclaims the old bytes.
    // The trainer-facing EXPORTS derive from the store: `kept/` lands
    // CLUSTERED on split (one contiguous file range per split — a
    // trainer reading only `train` prunes at file granularity), and the
    // training split additionally ships its greedy token-budget packing
    // (TextOps.packSequences) so the consumer starts from sequence
    // bins, not raw docs.
    // Publication identity: the published corpus is a DETERMINISTIC
    // function of (admitted doc set, pair params, splitter, excision) —
    // decontamination, splits, and packing are all content-hash /
    // parameter driven. In warm indexed mode the admitted-set tag is
    // already exact ([[graft.incremental.IngestIndex.docSetTag]]); ride
    // it as the corpus store's commit tag, and when a re-run derives
    // the SAME identity over an outDir whose artifacts carry it, skip
    // the rewrite — the reference's idempotent no-op re-run contract
    // (etl:202-213), extended to publication. A changed input, split
    // mode, or operator default misses the tag and publishes fully.
    val pubTag = warmState.zip(pairsTag).headOption.map { case (_, t) =>
      t + "|split=" + (if (clusterMode) "cluster" else "md5") +
        "|excise=" + (if (flag("SPARK_GRAFT_EXCISE").contains("1")) "1" else "0")
    }
    val store = new graft.incremental.SnapshotTable(spark, s"$outDir/corpus", "doc_id")
    def exportExists(name: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    if (pubTag.isDefined && store.exists && store.currentTag == pubTag &&
        exportExists("kept") && exportExists("train_packed")) {
      println("[corpus] publish: identical to the committed publication " +
        "(identity tag match) — rewrite skipped")
      stage("published", store.history.last._5)
      stage("train_packed", spark.read.parquet(s"$outDir/train_packed").count())
    } else {
      val out = clean
        .join(withSplit, Seq("doc_id"))
        .join(quality, Seq("doc_id"))
      val tag = pubTag.getOrElse(s"corpus-run:${stages.head._2}")
      // ACCUMULATE mode (SPARK_GRAFT_PUBLISH=accumulate): a GROWING
      // corpus — each delta batch MERGEs its gated publication into the
      // store instead of replacing it, so the store holds the union of
      // every published batch and the exports always cover the full
      // corpus. File-pruned: fresh doc_ids land above the old key range,
      // so a batch touches a sliver of the store. Pairs with indexed
      // admission for the cross-batch contracts: EXACT dedup is
      // cross-batch (the fp probe rejects re-crawls of anything any
      // earlier batch admitted); NEAR-dup scope stays batch-local — the
      // standard lambda split (the corpus-wide jaccard pass remains the
      // periodic batch operator's job, same caveat as the streaming
      // ingest's). Splits are content-hash deterministic, so a doc's
      // split never changes across batches. Default (create) keeps the
      // publication = this run's survivor set, exactly as before.
      // publish + maintenance under the store's advisory lock, so a
      // concurrent CorpusForget's zero-grace vacuum can never reclaim
      // this run's staged-but-uncommitted files (StoreLock scaladoc)
      graft.incremental.StoreLock.withLock(spark, s"$outDir/corpus", "CorpusRun",
          renewEveryMs = graft.incremental.StoreLock.defaultStaleMs / 3) {
      if (flag("SPARK_GRAFT_PUBLISH").contains("accumulate") && store.exists) {
        store.merge(out, tag = tag)
        println(s"[corpus] corpus store <- batch merged (accumulate mode, " +
          s"version ${store.currentVersion.get}, total ${store.history.last._5} docs)")
        // self-compaction: each delta batch lands batch-sized files, so
        // N batches leave ~N file sets and merge pruning/scans degrade
        // with batch count. Past the live-file threshold, OPTIMIZE
        // rewrites the small files into right-sized key-clustered ones
        // (content-identical commit) — the same trigger discipline as
        // the streaming sink's 64-file self-compaction.
        val compactFiles = flag("SPARK_GRAFT_COMPACT_FILES").map(_.toInt).getOrElse(64)
        if (store.history.last._4 > compactFiles) {
          store.optimize()
          println(s"[corpus] corpus store <- compacted to " +
            s"${store.history.last._4} files (accumulate maintenance)")
        }
      } else {
        store.create(out, tag = tag)
        println(s"[corpus] corpus store -> version ${store.currentVersion.get} at $outDir/corpus")
      }
      // retention: keep this publication + the previous one (rollback
      // window); older versions' files become vacuum-reclaimable so
      // repeated runs into one outDir don't grow disk without bound
      store.retire(keepLast = math.min(2, store.history.size))
      store.vacuum()
      }
      val storedOut = store.read()
      graft.sources.Sources.clusteredWrite(storedOut, s"$outDir/kept", "split")
      stage("published", storedOut.count())
      val packed = TextOps.packSequences(
        storedOut.filter(col("split") === "train"))
      packed.write.mode("overwrite").parquet(s"$outDir/train_packed")
      stage("train_packed", packed.count())
    }
    val s2 = spark
    import s2.implicits._
    stages.toSeq.toDF("stage", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/report.parquet")
    psi.coalesce(1).write.mode("overwrite").parquet(s"$outDir/psi.parquet")
    // indexed admission: fold this run's admitted slice into the
    // persisted state AFTER every gate passed and the corpus published —
    // the probe-then-absorb contract (a failed run absorbs nothing, so
    // the state only ever reflects published admissions). Cold start
    // builds the state from the admitted slice; warm runs append
    // segments (work ∝ batch, IngestIndex).
    ingestState.foreach { idx =>
      if (idx.exists) {
        // absorb ONLY the genuinely-new slice: every index row of a
        // state-hit doc is already persisted (fp, span keys, winnow
        // postings, shingle signature are all deterministic per text),
        // so absorbing it again adds nothing but segment mass. A full
        // re-run (stateHitIds = Some(None)) was already proven
        // no-new-content by the records early-out — zero extra jobs.
        stateHitIds.flatten match {
          case None =>
            println("[corpus] ingest state <- no new content (absorb skipped)")
          case Some(hits) =>
            // keeper hits ⊆ admitted and the admitted count is already
            // materialized (stage counter), so n_new falls out of
            // arithmetic; the anti-join runs only when n > 0
            val admitted = stages.find(_._1 == "exact_dedup").map(_._2).getOrElse(0L)
            val n = admitted - hits.count()
            if (n > 0) {
              val newDocs = exactStable.join(hits, Seq("doc_id"), "left_anti")
              idx.absorb(newDocs); println(s"[corpus] ingest state <- $n new docs")
            } else println("[corpus] ingest state <- no new content (absorb skipped)")
        }
      } else {
        idx.build(exactStable)
        println(s"[corpus] ingest state <- ${stages.find(_._1 == "exact_dedup").map(_._2).getOrElse(0L)} admitted docs (cold build)")
      }
      // memoize this run's pair frame for the next run over the same
      // admitted set (after absorb/build: a crash before this point
      // leaves a state without memo — a recompute, never a wrong read)
      if (pairsMemo.isEmpty)
        idx.putPairs(pairsTag.getOrElse(
          idx.docSetTag(admittedSig) + "|" + TextOps.nearDupJaccardParamsTag()), pairs)
    }
    val published = stages.find(_._1 == "published").map(_._2).getOrElse(0L)
    println(s"[corpus] done: $published docs published to $outDir/kept "
      + s"(+ ${stages.last._2} train docs packed)")
    if (owned) spark.stop()
  }
}
