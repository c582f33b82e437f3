package graft.streaming

import graft.core.{Edge, LinkingSample, Mention, Relation, Turn}
import graft.dicts.Dicts
import graft.ed.{Blocking, ConnectedComponents, EdEval, Linking}
import graft.io.TableIO
import graft.ner.MentionDetector
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming face of the per-turn pipeline.
  *
  * The reference is pure batch (SURVEY.md §2.11 — its "stream_files" are
  * bounded generators), but every per-turn stage here is stateless, so the
  * same mention detector runs unchanged under `readStream`: transcripts
  * arrive as micro-batches, mentions flow out in append mode, and windowed
  * mention counts demonstrate watermark + event-time aggregation. The only
  * cross-document stage (ED) stays batch (run it periodically over the
  * streamed mention sink — the `foreachBatch` shape).
  */
object StreamingPipeline {

  /** Streaming mention detection: same code path as batch (mapPartitions
    * over broadcast dicts), applied to a streaming Dataset[Turn].
    */
  def mentions(turns: Dataset[Turn], d: Dicts): Dataset[Mention] =
    MentionDetector.mentions(turns.sparkSession, turns, d)

  /** Running mention totals per surface via `mapGroupsWithState` — the
    * custom-state streaming shape (north_star: KeyValueGroupedDataset
    * custom state) that windowed aggregation can't express: state is an
    * arbitrary per-key value the user folds batch-by-batch (here a running
    * occurrence total + the number of micro-batches the surface appeared
    * in), emitted in Update mode on every change. Scale shape: state lives
    * in the state store keyed by surface
    * — one row per DISTINCT surface, not per occurrence; a hot key folds
    * its occurrences within each micro-batch before touching the store.
    *
    * State-size contract (ADVICE r03): with `idleTimeout = None` the store
    * holds one row per distinct surface EVER seen — bounded only by the
    * gazetteer+rule surface space, which for this detector is
    * dictionary-sized (detection emits known surfaces and capped candidate
    * spans), not stream-sized; that cardinality bound is the API contract
    * of the default. For open-ended deployments pass an idle TTL (e.g.
    * `Some("2 hours")`): a surface unseen for that long is evicted
    * (ProcessingTimeTimeout) and restarts from zero if it reappears —
    * counts become "totals since last activity gap", the standard trade.
    */
  def runningMentionCounts(turns: Dataset[Turn], d: Dicts,
      idleTimeout: Option[String] = None): Dataset[(String, Long, Long)] = {
    val spark = turns.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    mentions(turns, d)
      .groupByKey(_.surface)
      .mapGroupsWithState(timeoutConf) {
        (surface: String, occs: Iterator[Mention], state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle eviction: drop the state row; emit a tombstone with the
            // last known totals (batches = 0 marks it — downstream may
            // filter). The key's next appearance restarts from zero.
            val (total, _) = state.getOption.getOrElse((0L, 0L))
            state.remove()
            (surface, total, 0L)
          } else {
            val batchN = occs.size.toLong
            val (prevTotal, prevBatches) = state.getOption.getOrElse((0L, 0L))
            val next = (prevTotal + batchN, prevBatches + 1)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            (surface, next._1, next._2)
          }
      }
  }

  /** Windowed mention counts with a watermark: event-time tumbling window
    * over `ts`, counting mentions per surface. The event time is carried
    * THROUGH the single detection pass — round 2 re-joined the mention
    * stream back to the turn stream, a stream-stream join whose state no
    * watermark can evict (the watermark sat after the join), i.e. unbounded
    * state growth on a long-running query. One branch, no join: only the
    * windowed aggregation holds state, and the watermark bounds it.
    */
  def windowedMentionCounts(turns: Dataset[Turn], d: Dicts,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(d)
    val withTs = turns.mapPartitions { it =>
      val dicts = bc.value
      it.flatMap(t => MentionDetector.detect(t.text, dicts).map(s => (s.surface, t.ts)))
    }.toDF("surface", "ts")
    withTs
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window($"ts", window), $"surface")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"surface", $"n")
  }

  /** INCREMENTAL KG construction over a transcript stream — the full
    * NER → RE → ED → CC → triples flow in `foreachBatch` shape:
    *
    * per micro-batch, detect mentions + relations (stateless, same code as
    * batch), build the batch's deduplicated sample set, score its
    * within-batch edges (J7) AND its edges against every previously seen
    * sample (J8 `EdEval.edgesBetween` — the reference's new-vs-old compare,
    * `efficient_prediction.py:201-204`), fold them into the previous
    * component assignment with INCREMENTAL connected components (previous
    * labels replace the edge history — per-batch cost is batch edges +
    * seen vertices, never the accumulated edge set), and append the
    * batch's triples with canonical surfaces AS OF this batch.
    * Accumulated samples and components persist as ONE [[TableIO]]
    * multi-table snapshot per batch — a SINGLE atomic pointer flip commits
    * samples, components AND the committed-batch watermark together (round
    * 2 flipped two pointers separately and appended triples outside any
    * commit: a crash between the flips lost a batch's edges, a replay
    * duplicated its triples — ADVICE r02). The triples sink is idempotent:
    * each batch OVERWRITES its own `batch_id=<id>` partition directory
    * BEFORE the state commit, and a replayed batch whose id is already
    * committed is skipped entirely — so crash-at-any-point + restart yields
    * exactly-once triples. The streaming query pins a real
    * `checkpointLocation` (under `stateDir`) so a restart resumes the
    * source from its offset log instead of replaying from scratch.
    * Canonical ids refine as new case variants arrive; a periodic
    * compaction over the appended triples
    * (`Pipeline.canonicalTriplesSurfaced` shape) yields the converged KG.
    */
  def incrementalTriples(streamTurns: Dataset[Turn], d: Dicts,
      stateDir: String, outDir: String, queryName: String): StreamingQuery = {
    // broadcast ONCE for the life of the query — the dicts are immutable;
    // re-broadcasting per micro-batch (round 2) re-shipped the bundle every
    // second and accumulated stale broadcast blocks until driver GC
    val bc = streamTurns.sparkSession.sparkContext.broadcast(d)
    val q = streamTurns.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", s"$stateDir/_spark_checkpoint")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        processBatch(batch, bc, stateDir, outDir, batchId)
      }
      .start()
    q
  }

  /** [[processBatch]] with a per-call broadcast (test convenience). */
  def processBatch(batch: Dataset[Turn], d: Dicts, stateDir: String, outDir: String,
      batchId: Long): Unit =
    processBatch(batch, Dicts.broadcast(batch.sparkSession, d), stateDir, outDir, batchId)

  /** One micro-batch of the incremental flow (exposed for tests).
    *
    * Commit protocol (exactly-once under crash/replay at any point):
    *  1. skip if `batchId` ≤ the committed watermark (the batch's triples
    *     were already written — they land before the watermark advances);
    *  2. OVERWRITE `outDir/batch_id=<batchId>/` with the batch's triples
    *     (idempotent re-run of an uncommitted batch);
    *  3. commit samples + components + watermark as ONE snapshot with ONE
    *     atomic pointer flip.
    * A crash between 2 and 3 replays the batch: step 2 overwrites the same
    * partition, step 3 commits — no duplicates, no loss.
    */
  def processBatch(batch: Dataset[Turn], bc: org.apache.spark.broadcast.Broadcast[Dicts],
      stateDir: String, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val stateBase = s"$stateDir/state"
    // resolve the committed snapshot ONCE per batch and thread it through
    // (round-5 review: marker/currentSnapshot/readTable each independently
    // re-read the pointer + probe markers — 5+ metadata round-trips per
    // 1-second micro-batch on an object store, re-discovering a value the
    // single-writer protocol guarantees cannot change mid-batch)
    val curSnap = TableIO.currentSnapshot(stateBase)
    val committedBatch =
      if (curSnap < 0) -1L
      else TableIO.marker(stateBase, "batch_id", curSnap).flatMap(_.toLongOption).getOrElse(-1L)
    if (batchId == committedBatch) return // replay of the committed batch
    // Spark's streaming checkpoint only ever re-delivers the LAST batch; an
    // id BELOW the committed watermark means the source's batch numbering
    // regressed — a lost/reset checkpointLocation. Silently skipping would
    // drop NEW data under recycled ids; fail loudly instead. This guard
    // runs BEFORE the empty-batch return: with recycled ids after a lost
    // checkpoint, a run of empty recycled batches must not slip past it and
    // let the first non-empty recycled id collide with the watermark as a
    // fake "replay" (round-5 review).
    require(batchId > committedBatch,
      s"batch id $batchId regressed below committed watermark $committedBatch under $stateBase — " +
        "the streaming checkpointLocation was lost/reset; restore it or start a fresh stateDir")
    if (batch.isEmpty) return

    // ONE fused detection pass per batch (same discipline as Pipeline.run /
    // Checkpoints.runPipelineWith — round 2's streaming path scanned every
    // turn twice, once per extractor); both views project the cached flat
    // table
    val det = graft.pipeline.Pipeline.detectFlat(batch, bc).persist()
    val detDF = det.toDF()
    val relations = graft.pipeline.Pipeline.relationsView(detDF)
    val mentions = graft.pipeline.Pipeline.mentionsView(detDF)
    // NOT persisted: its single consumer is the anti-join right below —
    // freshNew (persisted + counted) is what every later stage reuses
    val newSamples = Linking.samples(mentions, relations)
    var freshNewP: Dataset[LinkingSample] = null
    var newEdgesP: Dataset[Edge] = null
    var allSamplesP: Dataset[LinkingSample] = null
    try {

    val haveState = curSnap >= 0
    val oldSamples: Dataset[LinkingSample] =
      if (haveState) TableIO.readTable(spark, stateBase, "samples", curSnap).as[LinkingSample]
      else spark.emptyDataset[LinkingSample]

    // new-vs-new + new-vs-old (old samples keep their contexts: first wins)
    val freshNew = newSamples.join(oldSamples.select($"sample_id"), Seq("sample_id"), "left_anti")
      .as[LinkingSample].persist()
    freshNewP = freshNew
    freshNew.count()
    val batchEdges = Blocking.edges(freshNew, bc)
    val crossEdges = EdEval.edgesBetween(freshNew, oldSamples, bc)
    val newEdges = EdEval.mergeEdgeSets(Seq(batchEdges, crossEdges)).persist()
    newEdgesP = newEdges
    val allSamples = oldSamples.unionByName(freshNew).persist()
    allSamplesP = allSamples

    // incremental CC: previous component labels replace the edge history —
    // per-batch work stays proportional to (batch edges + seen vertices)
    // and the persisted state is the component map, not the edge set
    val components =
      if (haveState)
        ConnectedComponents.incremental(TableIO.readTable(spark, stateBase, "components", curSnap),
          allSamples.select($"sample_id".as[java.lang.Long]), newEdges)
      else
        ConnectedComponents.run(allSamples.select($"sample_id".as[java.lang.Long]), newEdges)
    val canonSurface = allSamples.select($"sample_id".as("id"), $"mention")
      .join(components, "id")
      .groupBy($"component").agg(min($"mention").as("canon"))
    val sampleCanon = allSamples.select($"sample_id".as("id"), $"mention")
      .join(components, "id").join(canonSurface, "component")
      .select($"mention", $"canon")

    // batch_id carried by the partition DIRECTORY (partition discovery
    // restores the column on read), so the overwrite below is batch-scoped
    val triples = relations.toDF()
      .join(sampleCanon.withColumnRenamed("mention", "obj_surface")
        .withColumnRenamed("canon", "obj_canon"), Seq("obj_surface"), "left")
      .join(sampleCanon.withColumnRenamed("mention", "subj_surface")
        .withColumnRenamed("canon", "subj_canon"), Seq("subj_surface"), "left")
      .select($"subj_surface".as("subj"), $"pred", $"obj_surface".as("obj"),
        $"conv_id", $"turn_idx",
        coalesce($"subj_canon", $"subj_surface").as("subj_canon"),
        coalesce($"obj_canon", $"obj_surface").as("obj_canon"))

    triples.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    // ONE commit point: state tables + watermark, single atomic pointer flip
    TableIO.writeSnapshotTables(stateBase,
      Seq("samples" -> allSamples.toDF(), "components" -> components),
      Map("batch_id" -> batchId.toString))
    // Retention: each commit writes a FULL copy of the accumulated state,
    // so an unvacuumed 1-second stream accretes ~86k snapshots/day and
    // cumulative write volume quadratic in stream lifetime (round-5
    // review). Keep the committed snapshot plus one predecessor (a reader
    // that resolved the previous snapshot just before this commit can
    // still finish against it); older ones go.
    TableIO.vacuum(stateBase, retain = 2)
    } finally {
      // release the batch caches on FAILURE too — foreachBatch retries the
      // batch, and leaked persists (allSamples is the full accumulated
      // state) would pile up across retries in a long-running stream
      det.unpersist()
      if (freshNewP != null) freshNewP.unpersist()
      if (newEdgesP != null) newEdgesP.unpersist()
      if (allSamplesP != null) allSamplesP.unpersist()
    }
  }

  /** Triples of COMMITTED batches only. The commit protocol writes a
    * batch's `outDir/batch_id=N/` partition BEFORE the state snapshot that
    * advances the watermark (step 2 before step 3 in [[processBatch]]), so
    * a raw reader of `outDir` between those steps — or after a crash if the
    * stream never restarts — observes uncommitted output (ADVICE r03). This
    * is the read-committed view: partition-prune to
    * `batch_id <= committed watermark`; an in-flight or orphaned batch
    * directory is invisible until its commit lands (or forever, if it never
    * does — a replay overwrites it in place).
    */
  def committedTriples(spark: SparkSession, stateDir: String, outDir: String): DataFrame = {
    val watermark = TableIO.marker(s"$stateDir/state", "batch_id")
      .flatMap(_.toLongOption)
      .getOrElse(sys.error(s"no committed batch under $stateDir — nothing to read"))
    spark.read.parquet(outDir).filter(col("batch_id") <= watermark)
  }

  /** Drive a bounded source through the streaming mention path into an
    * in-memory sink and block until drained (test/local harness).
    */
  def runToMemory(spark: SparkSession, streamingTurns: Dataset[Turn], d: Dicts,
      queryName: String): StreamingQuery = {
    val q = mentions(streamingTurns, d).writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q
  }
}
