package graft.ed

import graft.core.{Component, Edge}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Dataset-native connected components — the replacement for the reference's
  * driver-side union-find over the ascending distance list (SURVEY.md §2.9
  * G2, `efficient_prediction.py:319-359`). Single-linkage clustering at a
  * fixed threshold is order-independent, so union-find over `filter(dist ≤
  * thr)` edges ≡ connected components over the same edge set (§2.7 O2) —
  * the ascending sort + early termination of the reference is replaced by a
  * pre-filter.
  *
  * Algorithm: min-label propagation with POINTER DOUBLING and EDGE
  * CONTRACTION per round (the dataframe form of large-star/small-star;
  * cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14):
  *   1. every vertex takes the min label in its closed neighborhood
  *   2. labels shortcut through themselves twice (comp := comp(comp)) —
  *      chains halve, so convergence is O(log n) rounds, not O(diameter)
  *   3. edges are remapped to (comp(src), comp(dst)), self-loops dropped —
  *      the working graph contracts toward empty, so later rounds are cheap
  *   4. every round's outputs are checkpointed ([[graft.io.Reliably]]):
  *      the logical plan stays flat instead of growing with the iteration
  *      count (lineage blowup is the classic failure of iterative DataFrame
  *      jobs — SURVEY §7.4.4). With a configured checkpoint dir the rounds
  *      use reliable `checkpoint()` (executor-loss-safe — the cluster
  *      setting); otherwise executor-local blocks (single-JVM, zero I/O)
  *
  * Termination: the contracted edge set is empty ⇔ every component has
  * collapsed onto its minimum id.
  */
object ConnectedComponents {

  /** Edge-count cutoff below which union-find runs on the driver: a tiny
    * edge set costs more in iterative-job scheduling than in memory. Edges
    * land as packed primitive long chunks — 16 B/edge, so 5M edges ≈ 80 MB
    * on the driver (plus the union-find's ≤2·5M-entry id index) — far below
    * driver heap; beyond it the distributed loop takes over. (The reference
    * always runs union-find on one node —
    * `efficient_prediction.py:319-359`; here that is only the small-graph
    * fast path.)
    */
  val DriverEdgeCutoff = 5000000L

  /** @param vertices all sample ids (isolated vertices keep their own id)
    * @param edges undirected similarity edges
    * @return (id, component) where component = min id reachable
    */
  def run(vertices: Dataset[java.lang.Long], edges: Dataset[Edge], maxIter: Int = 35,
      driverCutoff: Long = DriverEdgeCutoff): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._

    // The edge set is the most expensive upstream job (blocked pair scoring);
    // count() + the first downstream consumer must NOT execute it twice.
    // Persist unless the caller already did (checked on the source Dataset).
    val ownPersist = edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownPersist) edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgePairs = edges.select($"src", $"dst").as[(Long, Long)]
    val nEdges = edgePairs.count() // materializes the persist
    if (nEdges == 0) {
      // no edges ⇒ every vertex is its own component — skip the (empty)
      // incident join entirely; corpora whose variants all collapse in the
      // exact-surface pre-cluster hit this constantly
      if (ownPersist) edges.unpersist()
      return vertices.toDF("id").withColumn("component", $"id")
    }
    // driver fast path only below BOTH the caller's cutoff and the packed
    // union-find's hard 2^27 bound (ADVICE r05: a caller raising
    // driverCutoff past the bound used to pay the full collect and then
    // crash on the require inside runOnDriverIncident; now it routes to
    // the distributed loop before any collect)
    if (nEdges <= math.min(driverCutoff, 1L << 27)) {
      // Driver fast path: collect only EDGE-INCIDENT vertices (≤ 2·nEdges
      // ids). The vertex set itself is unbounded (every unique surface at
      // web scale); isolated vertices never move, so they get
      // component = id distributedly via a left join below. Edges arrive as
      // one packed primitive Array[Long] per partition ([src,dst,src,dst,…]
      // — 16 B/edge; a collect() of boxed (Long,Long) tuples costs ~4× that
      // in driver heap at the 5M cutoff, VERDICT r04 #4).
      val packed = edgePairs.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { case (s, d) => buf += s; buf += d }
        Iterator.single(buf.result())
      }.collect()
      if (ownPersist) edges.unpersist()
      val incident = runOnDriverIncident(spark, packed)
      return vertices.toDF("id")
        .join(incident, Seq("id"), "left")
        .select($"id", coalesce($"comp", $"id").as("component"))
    }

    var labels = vertices.toDF("id").withColumn("component", $"id").transform(graft.io.Reliably.checkpoint)

    var g = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .transform(graft.io.Reliably.checkpoint)
    // the edge cache is DEAD once g is checkpointed (eager) — releasing it
    // here instead of after up to 35 rounds stops the full edge set from
    // occupying executor memory/disk the whole iteration (round-5 review)
    if (ownPersist) edges.unpersist()

    var iter = 0
    while (iter < maxIter && !g.isEmpty) {
      // (1) min over closed neighborhood. g's endpoints are component ids of
      // the previous round, so the join key is "component", not "id".
      val nbrMin = g.groupBy($"src".as("component")).agg(min($"dst").as("nbr"))
      // persisted for the round: l1 feeds the pointer-doubling join on BOTH
      // sides, and only the exchanges below it are deduplicated by
      // ReuseExchange — without the persist the labels⋈nbrMin join over the
      // full vertex set executed twice per round (round-5 review)
      val l1 = labels.join(nbrMin, Seq("component"), "left")
        .select($"id", least($"component", coalesce($"nbr", $"component")).as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // (2) pointer doubling: comp := comp(comp) — components are vertex ids
      // themselves, so re-resolve through the freshly computed labels
      val byId = l1.select($"id".as("pid"), $"component".as("pcomp"))
      val l2 = l1.join(byId, l1("component") === byId("pid"), "left")
        .select(l1("id"), least(l1("component"), coalesce($"pcomp", l1("component"))).as("component"))
        .transform(graft.io.Reliably.checkpoint)
      l1.unpersist() // l2 is materialized (checkpoint is eager)

      // (3) contract the graph onto current component ids
      val m = l2.select($"id", $"component")
      val g1 = g
        .join(m.withColumnRenamed("id", "src").withColumnRenamed("component", "csrc"), Seq("src"))
        .join(m.withColumnRenamed("id", "dst").withColumnRenamed("component", "cdst"), Seq("dst"))
        .select($"csrc".as("src"), $"cdst".as("dst"))
        .filter($"src" =!= $"dst")
      // g was symmetric and contraction maps both directions, so g1 is
      // still symmetric — dedup is enough
      g = g1.distinct().transform(graft.io.Reliably.checkpoint)

      labels = l2
      iter += 1
    }
    labels
  }

  /** Small-graph fast path: classic union-find on the driver over the
    * edge-incident vertex set ONLY (bounded by 2·edge count, never by the
    * corpus vocabulary). Component id = min member id (same contract as the
    * distributed loop; equality asserted in EdSpec). Takes per-partition
    * packed edge chunks ([src,dst,src,dst,…] — primitive longs, the
    * driver-heap-lean collect shape). Returns (id, comp) for incident
    * vertices; callers attach isolated vertices via left join.
    */
  private def runOnDriverIncident(spark: org.apache.spark.sql.SparkSession,
      packedEdges: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    val nEdges = packedEdges.iterator.map(_.length.toLong / 2).sum
    // hard bound WELL below Int-index territory: cap = 4×maxIds must stay a
    // positive power of two ≤ 2³⁰ (maxIds*4 wrapped negative past ~268M
    // edges, collapsing the table to 8 slots and turning idx() into an
    // infinite probe loop — round-5 review). The default cutoff is 5M; a
    // caller raising driverCutoff past this bound belongs on the
    // distributed path anyway.
    require(nEdges <= (1L << 27),
      s"driver union-find fast path supports <= ${1L << 27} edges, got $nEdges; use the distributed loop")
    val maxIds = math.max(2L, nEdges * 2).toInt // incident vertices ≤ 2·edges
    // Primitive structures END TO END (round-5 review: the packed collect's
    // 16 B/edge saving was being swamped by a boxed HashMap + ArrayBuffers
    // here — boxed Long keys alone cost ~50 B each at the 5M-edge cutoff).
    // Open-addressing long→slot map with linear probing, power-of-two
    // capacity ≥ 4×maxIds (load factor ≤ 0.25); EMPTY = -1L marks free
    // slots. Vertex ids are hash-valued longs and MAY be negative — only
    // the exact value -1L is reserved, and an id hashing to exactly -1L
    // (probability 2⁻⁶⁴ per id) fails the require loudly instead of
    // corrupting the map.
    var cap = java.lang.Integer.highestOneBit(maxIds * 4 - 1) << 1
    if (cap < 8) cap = 8
    val mask = cap - 1
    val keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1L)
    val slotOf = new Array[Int](cap)
    val ids = new Array[Long](maxIds)
    val parent = new Array[Int](maxIds)
    var nIds = 0
    def idx(v: Long): Int = {
      require(v != -1L, "vertex id -1 collides with the open-addressing sentinel")
      var h = (java.lang.Long.hashCode(v * 0x9E3779B97F4A7C15L)) & mask
      while (keys(h) != v && keys(h) != -1L) h = (h + 1) & mask
      if (keys(h) == v) slotOf(h)
      else {
        keys(h) = v
        slotOf(h) = nIds
        ids(nIds) = v
        parent(nIds) = nIds
        nIds += 1
        nIds - 1
      }
    }
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    packedEdges.foreach { chunk =>
      var e = 0
      while (e < chunk.length) {
        val ia = idx(chunk(e)); val ib = idx(chunk(e + 1))
        val ra = find(ia); val rb = find(ib)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        e += 2
      }
    }
    val minId = new Array[Long](nIds)
    java.util.Arrays.fill(minId, Long.MaxValue)
    var i = 0
    while (i < nIds) {
      val r = find(i)
      if (ids(i) < minId(r)) minId(r) = ids(i)
      i += 1
    }
    // Ship the result back out as packed primitive chunks and unbox on the
    // EXECUTORS: building a driver-side Seq[(Long, Long)] for createDataset
    // would transiently allocate ~60 B/vertex of tuples+boxes — several
    // times the structures above at the cutoff.
    val ChunkRows = 262144
    val nChunks = (nIds + ChunkRows - 1) / ChunkRows
    val outChunks = (0 until nChunks).map { c =>
      val lo = c * ChunkRows
      val hi = math.min(nIds, lo + ChunkRows)
      val a = new Array[Long]((hi - lo) * 2)
      var j = lo
      while (j < hi) {
        a((j - lo) * 2) = ids(j)
        a((j - lo) * 2 + 1) = minId(find(j))
        j += 1
      }
      a
    }
    if (nChunks == 0) return spark.emptyDataset[(Long, Long)].toDF("id", "comp")
    val rdd = spark.sparkContext.parallelize(outChunks, nChunks)
      .mapPartitions(_.flatMap { a =>
        (0 until a.length / 2).iterator.map(k => (a(k * 2), a(k * 2 + 1)))
      })
    spark.createDataset(rdd).toDF("id", "comp")
  }

  /** Driver-side union-find over an already-local edge list — min
    * reachable id per edge-incident vertex, the identical contract to
    * [[run]] (isolated vertices are the caller's to default to their own
    * id). Pipeline.run's small-vocabulary route uses it to skip even the
    * count + collect jobs of the Dataset driver path when the edges were
    * computed locally; equality with [[run]] is pinned in Round6Spec.
    */
  private[graft] def unionFindLocal(edges: Iterable[(Long, Long)]): collection.Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val minId = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keysIterator.foreach { v =>
      val r = find(v)
      if (v < minId.getOrElse(r, Long.MaxValue)) minId(r) = v
    }
    val out = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keysIterator.foreach(v => out(v) = minId(find(v)))
    out
  }

  /** Typed convenience. */
  def components(vertices: Dataset[java.lang.Long], edges: Dataset[Edge]): Dataset[Component] = {
    val spark = vertices.sparkSession
    import spark.implicits._
    run(vertices, edges).as[Component]
  }

  /** INCREMENTAL connected components: fold `newEdges` into an existing
    * component assignment without replaying historical edges. A previous
    * label (id, component) IS connectivity evidence — re-expressed as a
    * zero-cost edge id↔component — so the union of (previous-label edges ∪
    * new edges) has exactly the connectivity of (all historical edges ∪
    * new edges), at the cost of one row per previously-seen vertex instead
    * of the whole edge history. Per-batch work in the streaming KG stays
    * proportional to (batch edges + seen vertices), and the state that
    * must persist shrinks from the edge set to the component map.
    *
    * Output contract matches [[run]]: component = min reachable id over the
    * merged graph (ids are stable, so canonical representatives only ever
    * merge, never split).
    */
  def incremental(prevLabels: DataFrame, vertices: Dataset[java.lang.Long],
      newEdges: Dataset[Edge]): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val prevAsEdges = prevLabels
      .select(col("id").as("src"), col("component").as("dst"))
      .filter($"src" =!= $"dst")
      .withColumn("dist", lit(0.0))
      .as[Edge]
    val allVertices = vertices.toDF("id")
      .union(prevLabels.select(col("id")))
      .union(prevLabels.select(col("component").as("id")))
      .distinct()
      .as[java.lang.Long]
    run(allVertices, prevAsEdges.unionByName(newEdges))
  }
}
