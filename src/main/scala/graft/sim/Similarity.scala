package graft.sim

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>`
  * embedding column.
  *
  * Tiers (SURVEY §7 step 7 / BASELINE.json north star):
  *  - [[bruteTopK]]: exact cosine top-k — the correctness baseline.
  *    Queries are broadcast; the corpus scan is embarrassingly
  *    parallel and never shuffles (per-partition heap via window).
  *  - [[ivfTopK]]: IVF coarse quantization — the scale path for
  *    top-k (probe a few buckets instead of the whole corpus).
  *  - [[lshNearDup]] / [[lshCandidates]]: random-hyperplane LSH —
  *    the scale path for threshold near-dup. Each vector maps to
  *    `Tables` sign-bit buckets; the bucket equi-join replaces the
  *    |corpus|² cross product, so cost tracks true collision counts.
  *
  * Vector kernels are native codegen'd Catalyst expressions
  * ([[graft.functions.VecDot]] / [[graft.functions.VecNorm]]): a
  * primitive-float loop per row inside whole-stage codegen — no boxed
  * `Seq[Float]` UDF conversion, no interpreted higher-order-function
  * lambdas. All reductions are sequential left-to-right doubles, so
  * cosines are bit-reproducible cross-engine and every ANN query has
  * an exact DuckDB oracle (IEEE 754 ops are deterministic given the
  * same operand order).
  *
  * Hyperplanes are derived from a Knuth multiplicative integer hash —
  * exact integer arithmetic both engines can compute, no stored
  * random state.
  */
object Similarity {

  val Dim = 64

  /** Σ a_i·b_i over two float-array columns (sequential doubles). */
  def dot(a: Column, b: Column): Column = F.vecDot(a, b)

  def l2norm(v: Column): Column = F.vecNorm(v)

  /** Exact cosine top-k for a query subset (vec_id ≡ 0 mod `queryMod`).
    * Output: (qid, vec_id, carry…, rank, cos_x10k).
    *
    * @param corpusFilter optional metadata predicate applied to the
    *   CORPUS side before ranking (PRE-filtering — the correct
    *   filtered-ANN shape; queries are still drawn from the whole
    *   set). @param carry corpus columns to carry into the output. */
  def bruteTopK(emb: DataFrame, queryMod: Long, k: Int,
                corpusFilter: Option[Column] = None,
                carry: Seq[String] = Nil): DataFrame = {
    val base = emb.select(Seq(col("vec_id"), col("embedding")) ++ carry.map(col) :+
      l2norm(col("embedding")).as("norm"): _*)
    val qs = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"))
    val corpus = corpusFilter.fold(base)(base.filter)
    val scored = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("embedding"), col("qvec")) / (col("norm") * col("qnorm")))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(Seq(col("qid"), col("vec_id")) ++ carry.map(col) ++
        Seq(col("rank"), floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k")): _*)
  }

  // ---- IVF (inverted-file) ANN ----

  /** IVF top-k: corpus vectors are bucketed by nearest centroid
    * ("coarse quantization"); each query exhaustively searches only
    * its `nProbe` closest buckets.
    *
    * Centroids are data vectors picked by a deterministic id stride
    * (`vec_id % centroidMod == 0`) — a k-means fit would drop in here
    * without changing the plan shape. Scale anatomy, for corpus N,
    * centroids C, queries Q: assignment is N·C dot products inside a
    * single codegen'd projection over driver-held centroids — zero
    * shuffle, zero row blow-up; the probe list is Q·nProbe rows; the
    * search is a broadcast join of the probe list against the
    * assigned corpus, hitting ~N·nProbe/C corpus rows per query
    * instead of N — the classic IVF speedup — with the corpus side
    * never repartitioned.
    */
  /** Hard bound on the coarse-quantizer size: the stride only spreads
    * WHICH ids become centroids; the cap is what makes the
    * driver-held collect O(maxCentroids·Dim) REGARDLESS of corpus
    * size (a distributed TakeOrderedAndProject — the [[kmeansTrain]]
    * seeding convention). Without it \|C\| = N/centroidMod grows
    * linearly with the corpus. Scale rule: size \|C\| ≈ √N (SURVEY §9:
    * 100k centroids at 10B vectors) by setting centroidMod and
    * maxCentroids TOGETHER; the default cap never binds at test SFs
    * (\|stride\| = 9/9/33 at sf0.001/0.01/0.1), so oracle hashes are
    * unchanged while the bound holds at any scale. */
  val MaxCentroids = 1024

  /** The stride-selected, CAPPED centroid set every IVF tier collects
    * — smallest `maxCentroids` stride ids, deterministic. */
  private[graft] def strideCentroids(base: DataFrame, centroidMod: Long,
      maxCentroids: Int): Array[(Long, Array[Float], Double)] = {
    import base.sparkSession.implicits._
    base.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id"), col("embedding"), col("norm"))
      .orderBy(col("vec_id")).limit(maxCentroids)
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
  }

  def ivfTopK(emb: DataFrame, queryMod: Long, k: Int,
              centroidMod: Long = 61, nProbe: Int = 2,
              maxCentroids: Int = MaxCentroids): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    // Centroids are tiny by quantizer design (C×Dim, C capped by
    // [[MaxCentroids]]; SURVEY §9 sizes 100k at 10B vectors) —
    // collect them to the driver. This ships the SAME bytes through
    // the driver the former broadcast(cents) did; holding them lets
    // assignment be a pure projection.
    val centRows = strideCentroids(base, centroidMod, maxCentroids)
    val cids = centRows.map(_._1).toSeq
    // float→double widening is exact: the double-matrix dot is
    // bit-identical to the former float×float VecDot
    val cvecs = centRows.map(_._2.map(_.toDouble).toSeq).toSeq
    val cnorms = centRows.map(_._3).toSeq
    // coarse assignment: every vector to its nearest centroid, as ONE
    // codegen'd argmax kernel per corpus row over the driver-held
    // matrix ([[graft.functions.VecNearestCid]]). No N·C row blow-up
    // and — unlike the former crossJoin+max_by aggregate — no
    // groupBy(vec_id) repartitioning of the corpus: the embeddings
    // NEVER shuffle for assignment. Tie-break to smallest cid,
    // bit-identical to max_by(cid, struct(ccos, -cid)).
    val assigned = base.withColumn("cid",
      F.vecNearestCid(col("embedding"), col("norm"), cids, cvecs, cnorms))
    // probe scoring still wants the centroids as rows (Q·C is tiny);
    // rebuild the table from the collected rows — float vectors, so
    // the probe-side VecDot arithmetic is unchanged
    val cents = centRows.toSeq.toDF("cid", "cvec", "cnorm")
    // probe lists: each query's nProbe nearest centroids
    val qs = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .withColumn("pcos", dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("qid"), col("qvec"), col("qnorm"), col("cid"))
    // exact search within probed buckets only. The probe list is
    // Q·nProbe rows by construction (queries are a deliberate small
    // subset) — broadcast it so the corpus-sized assigned table joins
    // map-side instead of shuffling both sides by cid.
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("embedding"), col("qvec")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k"))
  }

  // ---- k-means (Lloyd) centroid training ----

  /** Spherical k-means training: `iters` Lloyd rounds of
    * cosine-argmax assignment + per-cluster mean, returning the final
    * centroids as (cid, dim, q_milli, n_assigned) rows.
    *
    * Seeding is scale-safe by construction: candidates are the stride
    * `vec_id % centroidMod == 0`, but the seed set is the smallest `k`
    * of them — a distributed top-k (TakeOrderedAndProject), so the
    * driver collect is O(k·dims) REGARDLESS of corpus size. Without
    * the cap the collect grows as N/centroidMod — at 10B vectors the
    * default stride would collect 160M rows; with it, callers pick k
    * (SURVEY §9 sizes 100k at 10B vectors) and the stride only spreads
    * which ids seed.
    *
    * Scale anatomy (the canonical distributed k-means shape):
    *  - centroids are TINY (C×Dim) — they live on the driver and ride
    *    into codegen each round; assignment is a pure projection
    *    ([[graft.functions.VecNearestCid]] argmax kernel), so the
    *    corpus NEVER shuffles — zero Exchange between the scan and
    *    the per-(cid, dim) update aggregate.
    *  - the update step shuffles only partial per-(cid, dim) integer
    *    sums (≤ partitions·C·Dim rows), never vectors.
    *  - collecting C×Dim longs per round replaces `localCheckpoint`
    *    lineage truncation — the broadcast value IS data, not plan.
    *
    * Cross-engine determinism: centroid components are quantized to
    * integer thousandths each round (`floor(v·1000 + 0.5)` summed as
    * integers — order-free), the mean is `floor(sum/count)` in
    * doubles, and assignment scores divide a sequential-double dot
    * ([[graft.functions.VecDotD]]) by the centroid norm (the vector's
    * own norm is constant across candidate centroids and cannot
    * change the argmax, so it is dropped). Every step is replicated
    * verbatim by the DuckDB oracle — the whole training loop is
    * hash-verified, not rows-counted.
    */
  def kmeansTrain(emb: DataFrame, centroidMod: Long = 61, iters: Int = 2,
                  k: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"))
    var cents: Seq[(Long, IndexedSeq[Long])] = base
      .filter(col("vec_id") % centroidMod === 0)
      .orderBy(col("vec_id")).limit(k)
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
      .map { case (cid, v) =>
        (cid, v.iterator.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toIndexedSeq)
      }
    var counts = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      // assignment is a pure projection: argmax over the driver-held
      // centroids via the [[graft.functions.VecNearestCid]] kernel —
      // the corpus never shuffles, per round (the former
      // crossJoin+max_by aggregate hash-partitioned all N embeddings
      // every Lloyd iteration). norm = lit(1.0): the former score was
      // dot/cnorm with no own-norm factor, and 1.0·x == x exactly.
      val cidsNow = cents.map(_._1)
      val cvecsNow = cents.map { case (_, q) => q.map(_ / 1000.0): Seq[Double] }
      val cnormsNow = cvecsNow.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
      val assigned = base.withColumn("cid",
        F.vecNearestCid(col("embedding"), lit(1.0), cidsNow, cvecsNow, cnormsNow))
      val upd = assigned.select(col("cid"), posexplode(col("embedding")))
        .toDF("cid", "dim", "v")
        .groupBy("cid", "dim")
        .agg(sum(floor(col("v").cast("double") * 1000 + lit(0.5))).as("sq"),
          count(lit(1)).as("cnt"))
        .select(col("cid"), col("dim"),
          floor(col("sq").cast("double") / col("cnt").cast("double")).as("q"),
          col("cnt"))
        .as[(Long, Int, Long, Long)].collect()
      val byCid = upd.groupBy(_._1)
      counts = cents.map { case (cid, _) =>
        cid -> byCid.get(cid).map(_.head._4).getOrElse(0L)
      }.toMap
      // an emptied cluster keeps its previous centroid (and counts 0)
      cents = cents.map { case (cid, oldQ) =>
        byCid.get(cid) match {
          case Some(rows) => (cid, rows.sortBy(_._2).map(_._3).toIndexedSeq)
          case None       => (cid, oldQ)
        }
      }
    }
    cents.flatMap { case (cid, q) =>
      q.zipWithIndex.map { case (v, d) => (cid, d, v, counts(cid)) }
    }.toDF("cid", "dim", "q_milli", "n_assigned")
  }

  /** IVF top-k over TRAINED centroids: [[kmeansTrain]] fits the
    * coarse quantizer, then the probe-limited search runs exactly as
    * [[ivfTopK]] — completing the train/search pair (ivfTopK's
    * stride "centroids" are the plan-shape baseline; this is the
    * recall-quality path). Centroid scores divide by the centroid
    * norm only (the vector's own norm is constant across candidates);
    * the final in-bucket ranking is the true cosine. */
  def ivfTopKTrained(emb: DataFrame, queryMod: Long, k: Int,
                     centroidMod: Long = 61, iters: Int = 2,
                     nProbe: Int = 2, centK: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val trained = kmeansTrain(emb, centroidMod, iters, centK)
      .as[(Long, Int, Long, Long)].collect()
    val centSeq = trained.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, rows) =>
      val cvec = rows.sortBy(_._2).map(_._3 / 1000.0).toSeq
      val cnorm = math.sqrt(cvec.foldLeft(0.0)((a, x) => a + x * x))
      (cid, cvec, cnorm)
    }
    val cents = centSeq.toDF("cid", "cvec", "cnorm")
    val base = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    // pure-projection assignment over the trained (driver-held)
    // centroids — see [[ivfTopK]]; score was dot/cnorm (no own-norm
    // factor), hence norm = lit(1.0)
    val assigned = base.withColumn("cid",
      F.vecNearestCid(col("embedding"), lit(1.0),
        centSeq.map(_._1), centSeq.map(_._2), centSeq.map(_._3)))
    val qs = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("pscore").desc, col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .withColumn("pscore", F.vecDotD(col("qvec"), col("cvec")) / col("cnorm"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("qid"), col("qvec"), col("qnorm"), col("cid"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("embedding"), col("qvec")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k"))
  }

  // ---- product quantization (PQ) ----

  /** PQ top-k via asymmetric-distance computation (ADC) — the 100 TB
    * ANN MEMORY path, complementing IVF's compute path: each corpus
    * vector is compressed to `m` sub-space codeword indices
    * (64×4 bytes → 8 bytes at m=8: a 32× index compression), and
    * query scoring becomes m LUT lookups per vector instead of Dim
    * multiplies.
    *
    * Plan anatomy: the codebook (m·K×subDim, tiny by construction) is
    * driver-held; code assignment ([[graft.functions.VecPqCodes]]) and
    * the per-query LUT ([[graft.functions.VecPqLut]]) are pure codegen
    * projections — the corpus NEVER shuffles; scoring is the broadcast
    * query cross with [[graft.functions.VecPqAdc]] lookups; ranking
    * rides the same per-qid `WindowGroupLimit` heap as [[bruteTopK]].
    *
    * The codebook here is stride-seeded sub-vectors (k smallest
    * stride ids — a distributed TakeOrderedAndProject, O(k·Dim) on
    * the driver regardless of corpus size); a per-subspace k-means
    * fit ([[kmeansTrain]]'s loop on slices) would drop in without
    * changing the plan shape. Every float op is a sequential
    * left-to-right double reduction, so the WHOLE pipeline — codes,
    * LUTs, ADC scores, ranks — is replicated by the DuckDB oracle
    * and hash-verified.
    *
    * Output: (qid, vec_id, rank, adc_x10k) — adc is the approximate
    * query·vector dot reconstructed from codes. */
  def pqTopK(emb: DataFrame, queryMod: Long, k: Int,
             cbMod: Long = 29, cbK: Int = 16, m: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = Dim / m
    // codebook seeds: the cbK smallest stride ids — capped collect,
    // O(cbK·Dim) on the driver regardless of corpus size
    val seeds = emb.filter(col("vec_id") % cbMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(cbK)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // codebook[mi][k][i] = seed k's mi-th subvector (float→double
    // widening is exact)
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map { mi =>
        seeds.toSeq.map { case (_, v) =>
          (0 until subDim).map(i => v(mi * subDim + i).toDouble)
        }
      }
    val codes = emb.select(col("vec_id"),
      F.vecPqCodes(col("embedding"), codebook).as("codes"))
    val qs = emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"),
        F.vecPqLut(col("embedding"), codebook).as("lut"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))
    codes.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        F.vecPqAdc(col("codes"), col("lut"), seeds.length).as("adc"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("adc") * 10000 + lit(0.5)).as("adc_x10k"))
  }

  /** Two-stage retrieval (candidate generation → exact re-rank): the
    * production serving shape. Stage 1 is [[ivfPqTopK]] with a WIDE k
    * (`kCand`, e.g. 100) — compressed-domain ADC scores whose job is
    * only to not lose the true neighbors; stage 2 GATHERS the exact
    * embeddings for just those candidates (a hash join of the
    * queries×kCand candidate list against the corpus — the only time
    * full vectors are touched after indexing) and re-scores with
    * exact cosine, keeping the top `k`.
    *
    * Scale anatomy: stage-1 cost is unchanged from ivfPqTopK; stage 2
    * touches Q·kCand rows — independent of corpus size — and the
    * query side broadcasts. ADC quantization error affects only which
    * candidates make the wide list, not their final order, so recall
    * can only improve over PQ-only ranking (spec-asserted against the
    * brute-force oracle). */
  def ivfPqRerank(emb: DataFrame, queryMod: Long, kCand: Int, k: Int,
                  centroidMod: Long = 61, nProbe: Int = 2,
                  cbMod: Long = 29, cbK: Int = 16, m: Int = 8,
                  maxCentroids: Int = MaxCentroids): DataFrame = {
    val cand = ivfPqTopK(emb, queryMod, kCand, centroidMod, nProbe,
        cbMod, cbK, m, maxCentroids)
      .select(col("qid"), col("vec_id"))
    val base = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    val qs = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    cand.join(base, Seq("vec_id"))
      .join(broadcast(qs), Seq("qid"))
      .withColumn("cos", dot(col("embedding"), col("qvec")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k"))
  }

  /** IVF × PQ composition — the production ANN architecture at 10B
    * vectors: IVF's coarse assignment prunes the search to nProbe/C
    * of the corpus (the COMPUTE win), and PQ codes replace the
    * embeddings inside each bucket (the MEMORY win) — ADC scoring
    * touches m bytes per candidate instead of Dim floats.
    *
    * One codegen projection per corpus row yields BOTH the bucket id
    * ([[graft.functions.VecNearestCid]]) and the PQ codes
    * ([[graft.functions.VecPqCodes]]) — the corpus never shuffles and
    * its embeddings never travel; the probe list (qid, cid, lut)
    * broadcasts. Same determinism contract as [[pqTopK]]/[[ivfTopK]],
    * so the composed pipeline is fully hash-verified in SQL. */
  def ivfPqTopK(emb: DataFrame, queryMod: Long, k: Int,
                centroidMod: Long = 61, nProbe: Int = 2,
                cbMod: Long = 29, cbK: Int = 16, m: Int = 8,
                maxCentroids: Int = MaxCentroids): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = Dim / m
    val base = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    // coarse quantizer: capped stride centroids, driver-held (see
    // ivfTopK / MaxCentroids for the bound)
    val centRows = strideCentroids(base, centroidMod, maxCentroids)
    val cids = centRows.map(_._1).toSeq
    val cvecs = centRows.map(_._2.map(_.toDouble).toSeq).toSeq
    val cnorms = centRows.map(_._3).toSeq
    // PQ codebook: capped stride-seed subvectors, driver-held (see pqTopK)
    val seeds = emb.filter(col("vec_id") % cbMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(cbK)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map { mi =>
        seeds.toSeq.map { case (_, v) =>
          (0 until subDim).map(i => v(mi * subDim + i).toDouble)
        }
      }
    // ONE pass over the corpus: bucket id + codes; embeddings are
    // dropped right here — nothing wider than (id, cid, m codes)
    // flows further
    val indexed = base.select(col("vec_id"),
      F.vecNearestCid(col("embedding"), col("norm"), cids, cvecs, cnorms).as("cid"),
      F.vecPqCodes(col("embedding"), codebook).as("codes"))
    // probe list: per query its nProbe closest buckets + its ADC LUT
    val cents = centRows.toSeq.toDF("cid", "cvec", "cnorm")
    val qs = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"),
        F.vecPqLut(col("embedding"), codebook).as("lut"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .withColumn("pcos", dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("qid"), col("cid"), col("lut"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))
    indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        F.vecPqAdc(col("codes"), col("lut"), seeds.length).as("adc"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("adc") * 10000 + lit(0.5)).as("adc_x10k"))
  }

  /** BUILD-ONCE: persist the IVF×PQ index — the production serving
    * shape where indexing cost is paid once and amortized over every
    * query batch. Three parquet tables under `path`:
    *   - `codes/`  (vec_id, codes, cid) — one row per corpus vector,
    *     PARTITIONED BY the IVF bucket id `cid`, so a probe list
    *     prunes whole directories at the file-listing level (the
    *     on-disk analogue of ivfPqTopK's in-memory bucket join); a
    *     single repartition(cid) exchange precedes the write so each
    *     bucket lands in one file, not one file per task×bucket.
    *   - `cents/`  (cid, cvec, cnorm) — |C| rows, the coarse
    *     quantizer; collected driver-side at serve time.
    *   - `seeds/`  (seed_id, svec) — cbK rows; the PQ codebook is a
    *     pure reshape of the seed vectors, so the artifact is
    *     self-describing: cbK = the seeds row count and m = the
    *     stored codes array width (seeds alone do NOT encode m — a
    *     seed is a full Dim-wide vector for every m).
    * Same centroid/seed/codes derivation as [[ivfPqTopK]] — byte
    * identical index content. */
  /** Version stamp of the stored-index layout (bumped when the layout
    * grew the `meta/` table — readers REQUIRE it rather than inferring
    * shape parameters from data rows). */
  val IndexFormatVersion = 2

  /** The index's shape parameters, persisted as `$path/meta` — ONE row
    * of scalars. m is NOT recoverable from the seeds table (a seed is
    * a full Dim-wide vector for every m) and reading it off an
    * arbitrary codes row costs a job per open AND trusts data to
    * describe layout; the meta table is the authority every stored
    * read resolves against. */
  case class IndexMeta(m: Int, cb_k: Int, dim: Int, n_centroids: Int,
                       format_version: Int)

  /** Read the index metadata; fails LOUDLY when absent — a path
    * without `meta/` is not (or predates) a graft IVF×PQ index. */
  def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): IndexMeta = {
    import spark.implicits._
    require(new java.io.File(s"$path/meta").exists(),
      s"no index metadata at $path/meta — not a graft IVF×PQ index " +
        s"(format_version >= $IndexFormatVersion)")
    spark.read.parquet(s"$path/meta").as[IndexMeta].head()
  }

  def ivfPqIndexWrite(emb: DataFrame, path: String,
                      centroidMod: Long = 61, cbMod: Long = 29,
                      cbK: Int = 16, m: Int = 8,
                      maxCentroids: Int = MaxCentroids): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = Dim / m
    val base = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    // capped stride centroids (see MaxCentroids): the cents table —
    // and every serve/upsert-time collect of it — is bounded by
    // construction, not by corpus size
    val centRows = strideCentroids(base, centroidMod, maxCentroids)
    val cids = centRows.map(_._1).toSeq
    val cvecs = centRows.map(_._2.map(_.toDouble).toSeq).toSeq
    val cnorms = centRows.map(_._3).toSeq
    val seeds = emb.filter(col("vec_id") % cbMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(cbK)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map { mi =>
        seeds.toSeq.map { case (_, v) =>
          (0 until subDim).map(i => v(mi * subDim + i).toDouble)
        }
      }
    base.select(col("vec_id"),
        F.vecNearestCid(col("embedding"), col("norm"), cids, cvecs, cnorms)
          .as("cid"),
        F.vecPqCodes(col("embedding"), codebook).as("codes"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/codes")
    centRows.toSeq.toDF("cid", "cvec", "cnorm")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cents")
    seeds.toSeq.toDF("seed_id", "svec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/seeds")
    Seq(IndexMeta(m, cbK, Dim, centRows.length, IndexFormatVersion)).toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** UPSERT a delta segment into the stored index with FROZEN
    * quantizers — the nightly index-maintenance shape (Lucene/FAISS
    * segment model): the coarse centroids and the PQ codebook are NOT
    * retrained on arrival; the delta is assigned + encoded with the
    * STORED quantizers (read back via bounded collects) and written
    * as its own `codes_delta/` segment — never an in-place append, so
    * the operation is idempotent under re-run and the base segment's
    * files are untouched. Serving unions the segments
    * ([[ivfPqServeStored]]'s `segments` parameter). Retraining is a
    * separate, rarer rebuild — exactly the production cadence. */
  def ivfPqUpsertDelta(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    import spark.implicits._
    // the delta MUST be encoded with the base's exact shape: m comes
    // from the stored meta table (the layout authority, read FIRST —
    // never inferred from an arbitrary data row), and a base trained
    // on a different embedding dimensionality fails loudly here
    // rather than silently corrupting ADC downstream.
    val meta = readIndexMeta(spark, path)
    val centRows = spark.read.parquet(s"$path/cents")
      .select(col("cid"), col("cvec"), col("cnorm"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val seeds = spark.read.parquet(s"$path/seeds")
      .select(col("seed_id"), col("svec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(meta.dim == Dim,
      s"stored index at $path has dim=${meta.dim}, delta vectors have dim=$Dim")
    require(seeds.length == meta.cb_k,
      s"stored seeds table has ${seeds.length} rows but meta says cb_k=${meta.cb_k}")
    val m = meta.m
    val subDim = Dim / m
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map { mi =>
        seeds.toSeq.map { case (_, v) =>
          (0 until subDim).map(i => v(mi * subDim + i).toDouble)
        }
      }
    val cids = centRows.map(_._1).toSeq
    val cvecs = centRows.map(_._2.map(_.toDouble).toSeq).toSeq
    val cnorms = centRows.map(_._3).toSeq
    delta.select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("norm"))
      .select(col("vec_id"),
        F.vecNearestCid(col("embedding"), col("norm"), cids, cvecs, cnorms)
          .as("cid"),
        F.vecPqCodes(col("embedding"), codebook).as("codes"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$path/codes_delta")
  }

  /** DELETE propagation into the stored index — the durable tier of
    * the right-to-be-forgotten story ([[ivfPqServeStored]]'s
    * `exclude` mask is the immediate tier): each listed segment's
    * CURRENT LIVE generation (resolved through the newest committed
    * manifest, so earlier compactions' tombstones stay erased even
    * when this call's delete set differs) is rewritten MINUS the
    * tombstoned vec_ids into a FRESH `<seg>_live_g<N>` generation, and
    * the swap is committed by writing an immutable manifest pointer
    * `livelog/v<N>` AFTERWARD (the `q_time_travel` pattern): the
    * previously-live generation is never deleted before the new one
    * commits, so a crash at ANY point leaves readers (who resolve
    * through [[liveSegments]]) on a complete generation — the earlier
    * overwrite-in-place `_live` layout had a window where a crash
    * mid-rewrite left a partial/empty live segment with no record of
    * what was current. The committed manifest is CUMULATIVE: segments
    * compacted in an earlier generation but not listed here carry
    * their live pointers forward, so a partial-segment compaction can
    * never resurrect deletions by letting an omitted segment resolve
    * back to its tombstone-bearing base. Unreferenced generations two
    * or more flips old are retired after the commit (carried-forward
    * live paths stay referenced and are never swept).
    * Returns the live segment names just committed (pass them to
    * [[ivfPqServeStored]]'s `segments`). Bucket partitioning is
    * preserved
    * (one repartition(cid) exchange per segment), so serving from the
    * live segments keeps dynamic partition pruning. The deletion list
    * broadcasts (\|tombstones\| ∝ deletion requests, small by law);
    * each segment is scanned once.
    *
    * Privacy boundary, stated plainly: the coarse centroids and PQ
    * seeds are corpus-sampled VECTORS — if a tombstoned id trained a
    * quantizer, full erasure additionally requires the (rarer)
    * quantizer rebuild; what this guarantees is that no deleted
    * vector is retrievable: its codes rows are gone and it can never
    * be served. */
  /** Generation numbers of every COMMITTED live-manifest under
    * `$path/livelog` (a manifest counts as committed only once its
    * `_SUCCESS` marker exists — a crash mid-flip leaves a marker-less
    * directory that readers ignore). */
  private def committedManifests(path: String): Seq[Int] = {
    val logDir = new java.io.File(s"$path/livelog")
    if (!logDir.exists()) Nil
    else logDir.listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.matches("v\\d+") &&
        new java.io.File(d, "_SUCCESS").exists())
      .map(_.getName.drop(1).toInt)
  }

  /** Resolve each logical segment name to its CURRENT live path
    * through the newest committed manifest; a segment never compacted
    * (or an index with no livelog at all) resolves to itself. */
  def liveSegments(spark: org.apache.spark.sql.SparkSession,
                   path: String, segments: Seq[String]): Seq[String] = {
    import spark.implicits._
    committedManifests(path).maxOption match {
      case None => segments
      case Some(n) =>
        val live = spark.read.parquet(s"$path/livelog/v$n")
          .select(col("segment"), col("live_path"))
          .as[(String, String)].collect().toMap
        segments.map(s => live.getOrElse(s, s))
    }
  }

  def ivfPqCompactDelete(spark: org.apache.spark.sql.SparkSession,
                         path: String, deleted: DataFrame,
                         segments: Seq[String]): Seq[String] =
    Similarity.synchronized { // same lock as ensureStoredIndex: concurrent
      // suites in one JVM share the content-keyed root; two compactions
      // racing would compute the same gen and clobber each other's writes
    import spark.implicits._
    // fresh generation number: one past the newest COMMITTED manifest
    // (a crashed attempt's orphan gets overwritten, never resurrected)
    val prevGen = committedManifests(path).maxOption
    val gen = prevGen.getOrElse(0) + 1
    // the previously committed segment→live mapping: compaction reads
    // FROM the current live generation (so earlier tombstones stay
    // erased even when this call's delete set differs) and the new
    // manifest CARRIES FORWARD segments this call doesn't mention — a
    // partial-segment compaction can never resurrect a deleted vector
    // by letting an omitted segment fall back to its base.
    val prevLive: Map[String, String] = prevGen match {
      case None => Map.empty
      case Some(n) =>
        spark.read.parquet(s"$path/livelog/v$n")
          .select(col("segment"), col("live_path"))
          .as[(String, String)].collect().toMap
    }
    val livePaths = segments.map(seg => seg -> s"${seg}_live_g$gen")
    // 1. write every compacted segment to its FRESH generation path —
    //    the previous live generation stays intact and serving until
    //    the manifest below commits (crash mid-rewrite = readers still
    //    resolve the old generation; nothing was deleted)
    //    NO pre-write exchange (r19, guide §2.4): the source generation
    //    is already hive-partitioned by cid, so every scan task holds
    //    rows of exactly one cid and partitionBy regroups nothing — the
    //    former repartition(cid) re-shuffled the entire segment just to
    //    consolidate files the layout already consolidates (task count
    //    = split count, each split single-cid).
    //    Independent per-segment rewrites run CONCURRENTLY (guide
    //    §2.6, overlap independent jobs): each write targets its own
    //    fresh generation directory, so a 2-3 thread pool lets the
    //    next segment's tasks back-fill the cores the previous
    //    segment's write tail frees. Failures propagate via get().
    val writePool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(livePaths.size, 3)))
    try {
      livePaths.map { case (seg, livePath) =>
        writePool.submit(new Runnable {
          def run(): Unit =
            spark.read.parquet(s"$path/${prevLive.getOrElse(seg, seg)}")
              .join(broadcast(deleted.select("vec_id")), Seq("vec_id"),
                "left_anti")
              .select(col("vec_id"), col("codes"), col("cid"))
              .write.mode("overwrite").partitionBy("cid")
              .parquet(s"$path/$livePath")
        })
      }.foreach(_.get())
    } finally writePool.shutdown()
    // 2. FLIP: commit the manifest pointer as its own immutable
    //    `livelog/v$gen` (the q_time_travel pattern — the _SUCCESS
    //    marker is the commit point, so the swap is all-or-nothing).
    //    The manifest is CUMULATIVE: segments compacted in earlier
    //    generations but not in this one keep their live pointers.
    val carried = (prevLive -- segments).toSeq
      .map { case (seg, lp) => (seg, lp, gen) }
    (livePaths.map { case (seg, livePath) => (seg, livePath, gen) } ++ carried)
      .toDF("segment", "live_path", "generation")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/livelog/v$gen")
    // 3. RETIRE stale generation directories: anything older than the
    //    previous flip AND not referenced by the current or previous
    //    committed manifest (the previous stays readable until the
    //    next commit — the crash-safety window; carried-forward live
    //    paths stay referenced and are never swept).
    val referenced: Set[String] =
      (livePaths.map(_._2) ++ carried.map(_._2) ++ prevLive.values).toSet
    val root = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val liveGen = "(.+)_live_g(\\d+)".r
    root.listFiles().toSeq.foreach { d =>
      d.getName match {
        case liveGen(_, g)
          if g.toInt <= gen - 2 && !referenced(d.getName) => rm(d)
        case _ => ()
      }
    }
    val logDir = new java.io.File(s"$path/livelog")
    logDir.listFiles().toSeq
      .filter(d => d.getName.matches("v\\d+") &&
        d.getName.drop(1).toInt <= gen - 2)
      .foreach(rm)
    livePaths.map(_._2)
  }

  /** Bumped when the stored-index FIXTURE layout/derivation changes —
    * an older marker fails validation and the fixture recommits. */
  val IndexFixtureVersion = 1

  /** Root of the shared content-keyed stored-index fixture for a
    * dataset: `full` = one base segment over the whole corpus;
    * `split9` = base (vec_id % 9 ≠ 0) + frozen-quantizer delta
    * (≡ 0 mod 9) — the `q_ann_upsert` layout. */
  def indexRoot(dir: String, split9: Boolean): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val variant = if (split9) "split9" else "full"
    s"${System.getProperty("java.io.tmpdir")}/graft_annix_${variant}_$key"
  }

  /** CONTENT-KEYED stored-index commit (the `VersionChain.ensure`
    * precedent, blessed for the maintenance tier in round 13): the
    * serve/upsert/merge/delete queries all read the SAME immutable
    * base(+delta) index per dataset, built once behind a marker
    * written LAST (a crashed build recommits). Validation on reuse:
    * fixture version + dataset + every segment's `_SUCCESS` + the
    * meta table + a footer-only count of the codes rows. Consumers
    * that MUTATE state do so additively (compaction writes fresh
    * `_live_g<N>` generations + livelog; merge writes its own target
    * segment) — the base segments are never touched, which is what
    * makes the sharing sound. At 100 TB this is not a test
    * convenience but the design: indexes are built once and served
    * many times; re-deriving one per query run was pricing the wrong
    * thing. */
  def ensureStoredIndex(spark: org.apache.spark.sql.SparkSession,
                        emb: DataFrame, dir: String,
                        split9: Boolean): String = synchronized {
    val root = indexRoot(dir, split9)
    val marker = new java.io.File(root, "_INDEX_OK")
    val head = s"$IndexFixtureVersion\n$dir\n$split9\n"
    if (marker.exists()) {
      val segs = Seq("codes", "cents", "seeds", "meta") ++
        (if (split9) Seq("codes_delta") else Nil)
      // torn/corrupt marker ⇒ invalid ⇒ recommit (never throw)
      val ok = scala.util.Try {
        val txt = java.nio.file.Files.readString(marker.toPath)
        txt.startsWith(head) && txt.split("\n", -1).length >= 4 &&
          segs.forall(s1 => new java.io.File(s"$root/$s1/_SUCCESS").exists()) &&
          spark.read.parquet(s"$root/codes").count() ==
            txt.split("\n", -1)(3).toLong
      }.getOrElse(false)
      if (ok) return root
      marker.delete()
    }
    if (split9) {
      ivfPqIndexWrite(emb.filter(col("vec_id") % 9 =!= 0), root)
      ivfPqUpsertDelta(emb.filter(col("vec_id") % 9 === 0), root)
    } else ivfPqIndexWrite(emb, root)
    val n = spark.read.parquet(s"$root/codes").count()
    java.nio.file.Files.writeString(marker.toPath, s"$head$n\n")
    root
  }

  /** Bumped when the brute-baseline derivation changes. */
  val BruteBaselineVersion = 1

  def bruteBaselineRoot(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_brute10_$key"
  }

  /** CONTENT-KEYED stored brute-force cosine truth (round 16, r15
    * advice #7): four queries re-derived the identical full-corpus
    * exact top-10 every run (`q_ann_recall`, `q_nprobe_curve`,
    * `q_ndcg`, `q_ann_sq`, plus `q_ann_lifecycle_recall`'s full-corpus
    * row) — the dominant cost of the evaluation tail. The truth is
    * deterministic in the dataset (ties broken by vec_id, cos floored
    * to x10k), so it is computed ONCE per dataset behind a marker and
    * served as a stored read — [[ensureStoredIndex]]'s discipline
    * applied to the evaluation baseline. Only the canonical shape
    * (queryMod=50, k=10, unfiltered, no carry) is stored; filtered or
    * differently-sized variants stay live. At scale this is how
    * evaluation actually runs: ground truth is materialized once per
    * corpus snapshot and reused across every index configuration. */
  def ensureBruteBaseline(spark: org.apache.spark.sql.SparkSession,
                          emb: DataFrame, dir: String): DataFrame =
    synchronized {
    val root = bruteBaselineRoot(dir)
    val marker = new java.io.File(root, "_BRUTE_OK")
    val head = s"$BruteBaselineVersion\n$dir\n"
    val ok = marker.exists() && scala.util.Try {
      val txt = java.nio.file.Files.readString(marker.toPath)
      txt.startsWith(head) && txt.split("\n", -1).length >= 3 &&
        new java.io.File(s"$root/topk/_SUCCESS").exists() &&
        spark.read.parquet(s"$root/topk").count() ==
          txt.split("\n", -1)(2).toLong
    }.getOrElse(false)
    if (!ok) {
      bruteTopK(emb, queryMod = 50L, k = 10)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/topk")
      val n = spark.read.parquet(s"$root/topk").count()
      java.nio.file.Files.writeString(marker.toPath, s"$head$n\n")
    }
    spark.read.parquet(s"$root/topk")
  }

  /** SEGMENT MERGE — the consolidation step the delta-upsert tier
    * creates the need for ([[ivfPqUpsertDelta]] accumulates small
    * delta segments; every serve pays one partition-discovered read
    * PER segment, and tiny deltas fragment the bucket files): union
    * the listed segments into ONE target segment with the bucket
    * (cid) partitioning preserved — quantizers are FROZEN and shared
    * by construction, so the merge is a pure re-layout: serving from
    * the merged segment is bit-equal to serving from the parts
    * (q_ann_merge's oracle proves it end-to-end). Every source
    * segment's code width is validated against the stored meta (the
    * [[IndexMeta]] contract) so a foreign-shape segment can never be
    * silently absorbed. One repartition(cid) exchange total — the
    * Lucene segment-merge cost model. */
  def ivfPqMergeSegments(spark: org.apache.spark.sql.SparkSession,
                         path: String, segments: Seq[String],
                         target: String): Unit =
    Similarity.synchronized { // shared content-keyed root: a concurrent
      // merge overwriting the target mid-read would corrupt a serve
    val meta = readIndexMeta(spark, path)
    // ONE width-probe job for all source segments (was one head() per
    // segment): the union of per-segment limit(1) width rows collects
    // in a single scheduled job, and the loud foreign-shape refusal is
    // unchanged.
    import org.apache.spark.sql.functions.lit
    val widths = segments.map { seg =>
      spark.read.parquet(s"$path/$seg")
        .select(lit(seg).as("seg"), size(col("codes")).as("w")).limit(1)
    }.reduce(_ unionAll _).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    segments.foreach { seg =>
      val w = widths.getOrElse(seg,
        sys.error(s"segment $seg at $path is empty — nothing to merge"))
      require(w == meta.m,
        s"segment $seg has $w-wide codes but index meta at $path says " +
          s"m=${meta.m} — refusing to merge a foreign-shape segment")
    }
    val merged = segments.map { seg =>
      spark.read.parquet(s"$path/$seg")
        .select(col("vec_id"), col("codes"), col("cid").cast("long").as("cid"))
    }.reduce(_ unionAll _)
    merged.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/$target")
  }

  /** SERVE-MANY: two-stage retrieval ([[ivfPqRerank]]'s contract)
    * answered FROM the index persisted by [[ivfPqIndexWrite]] —
    * stage 1 scans the STORED codes table (never the embeddings);
    * the corpus embeddings are touched only by stage 2's exact
    * gather of the Q·kCand candidate list. Centroids and the PQ
    * codebook are reconstructed from the stored cents/seeds tables
    * via bounded collects (|C| and cbK rows — index metadata, not
    * corpus). m and cbK come from the stored `meta/` table (the
    * layout authority — see [[IndexMeta]]); segment codes width is
    * validated AT TOUCH TIME, per scored row, inside the ADC kernel
    * (r19/ADVICE r20 contract): a shape-mismatched segment fails
    * loudly on the first row the probe list reaches, but a segment
    * whose rows land only in unprobed buckets (or are fully
    * tombstone-masked) is not probed and therefore not validated —
    * its vectors also never surface. Because codes is PARTITIONED BY cid
    * and the probe list broadcasts, Catalyst inserts a DYNAMIC
    * partition-pruning filter on the codes scan (AnnServeSpec
    * asserts it) — at scale only the nProbe bucket directories a
    * query batch touches are read at all. Bit-equal to the in-memory
    * [[ivfPqRerank]] with the same parameters (AnnServeSpec). */
  /** The bounded per-index metadata a stored serve needs — cents,
    * seeds, meta: three small collects (|C|, cbK and 1 rows — index
    * metadata, not corpus). Callers issuing SEVERAL serves against
    * the same index in ONE query run load it once and pass it to each
    * [[ivfPqServeStored]] — within-run reuse only (the r19 "no
    * serve-metadata memo across reps" ruling stands: every query run
    * reloads from the stored tables). */
  case class ServeCtx(cents: Array[(Long, Array[Float], Double)],
                      seeds: Array[(Long, Array[Float])],
                      meta: IndexMeta)

  def loadServeCtx(spark: org.apache.spark.sql.SparkSession,
                   path: String): ServeCtx = {
    import spark.implicits._
    val centRows = spark.read.parquet(s"$path/cents")
      .select(col("cid"), col("cvec"), col("cnorm"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val seeds = spark.read.parquet(s"$path/seeds")
      .select(col("seed_id"), col("svec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    ServeCtx(centRows, seeds, readIndexMeta(spark, path))
  }

  def ivfPqServeStored(emb: DataFrame, path: String, queryMod: Long,
                       kCand: Int, k: Int, nProbe: Int = 2,
                       segments: Seq[String] = Seq("codes"),
                       exclude: Option[DataFrame] = None,
                       ctx: Option[ServeCtx] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // index metadata: bounded collects over the small stored tables
    // (shared across a run's serves when the caller passes a ctx)
    val ServeCtx(centRows, seeds, meta) =
      ctx.getOrElse(loadServeCtx(spark, path))
    require(seeds.length == meta.cb_k,
      s"stored seeds table has ${seeds.length} rows but meta says cb_k=${meta.cb_k}")
    require(centRows.length == meta.n_centroids,
      s"stored cents table has ${centRows.length} rows but meta says " +
        s"n_centroids=${meta.n_centroids}")
    val cbK = meta.cb_k
    // one partition-discovered read per segment, then a union — Spark
    // refuses multi-root partitioned reads in a single load. Each
    // segment's codes width must match meta.m: a segment encoded
    // against a DIFFERENT index shape (a mis-copied delta, a base
    // rebuilt under an old segment) fails LOUDLY here — ADC with a
    // mismatched m would silently score garbage.
    // Segment-width validation moved INTO the ADC kernel (r19):
    // vec_pq_adc throws per row on a codes/LUT width mismatch, so a
    // segment encoded against a different index shape still fails
    // LOUDLY on first touch — without the former per-segment
    // width-probe job each serve paid before planning.
    val codesAll = segments.map { seg =>
      spark.read.parquet(s"$path/$seg")
        .select(col("vec_id"), col("cid").cast("long").as("cid"),
          col("codes"))
    }.reduce(_ unionAll _)
    // serve-time deletion MASK: the tombstone list (small by law)
    // broadcast anti-joins the codes scan BEFORE stage-1 ranking, so
    // a deleted vector can never reach the candidate list (filtering
    // the final top-k instead would both leak rank positions and
    // return short lists). The durable tier is [[ivfPqCompactDelete]].
    val codes = exclude.fold(codesAll)(d =>
      codesAll.join(broadcast(d.select("vec_id")), Seq("vec_id"), "left_anti"))
    val m = meta.m
    val subDim = Dim / m
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map { mi =>
        seeds.toSeq.map { case (_, v) =>
          (0 until subDim).map(i => v(mi * subDim + i).toDouble)
        }
      }
    // query workload: embeddings of the query set only (Q rows)
    val qbase = emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        l2norm(col("embedding")).as("qnorm"))
    val qs = qbase.withColumn("lut", F.vecPqLut(col("qvec"), codebook))
    // cvec stays array<float> — the exact type the in-memory path's
    // centRows.toDF produces; a double cast would change vecDot's
    // operand widening and break bit-equality with ivfPqRerank.
    val cents = centRows.toSeq.toDF("cid", "cvec", "cnorm")
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .withColumn("pcos",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("qid"), col("cid"), col("lut"))
    // stage 1: ADC over the STORED codes (bucket-pruned by the join)
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))
    val cand = codes.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        F.vecPqAdc(col("codes"), col("lut"), cbK).as("adc"))
      .withColumn("rank", row_number().over(wCand))
      .filter(col("rank") <= kCand)
      .select(col("qid"), col("vec_id"))
    // stage 2: exact gather — the ONLY corpus-embedding touch
    val gather = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    cand.join(gather, Seq("vec_id"))
      .join(broadcast(qbase), Seq("qid"))
      .withColumn("cos",
        dot(col("embedding"), col("qvec")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k"))
  }

  // ---- random-hyperplane LSH ----

  val Tables = 4        // independent hash tables...
  val BitsPerTable = 12 // ...of 12 sign bits each

  /** Hyperplane component (p = plane index 0..47, i = dim 0..63):
    * Knuth multiplicative hash of the flat index, folded to
    * [-1000, 1000] thousandths. Exact integer arithmetic — the DuckDB
    * oracle computes the identical planes with SQL `generate_series`.
    */
  def planeComponent(p: Int, i: Int): Double =
    (((p * Dim + i + 1).toLong * 2654435761L) % 4294967296L % 2001L - 1000L) / 1000.0

  private val planes: Array[Array[Double]] =
    Array.tabulate(Tables * BitsPerTable)(p => Array.tabulate(Dim)(i => planeComponent(p, i)))

  /** All `Tables` sign-bit buckets of one vector in a single JIT'd
    * pass over the closure-held plane matrix (one UDF call per vector
    * instead of Tables×BitsPerTable interpreted dot expressions;
    * vectors are few enough that the boxed call is immaterial —
    * the hot all-pairs kernels are the codegen'd expressions). */
  private val bucketsUdf = udf((emb: Seq[Float]) =>
    Array.tabulate(Tables) { t =>
      var bucket = 0L
      var b = 0
      while (b < BitsPerTable) {
        val plane = planes(t * BitsPerTable + b)
        val n = math.min(plane.length, emb.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += emb(i).toDouble * plane(i); i += 1 }
        if (s >= 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    })

  /** (vec_id, table, bucket) — one row per hash table. Bucket is the
    * packed sign-bit integer of that table's planes. */
  def buckets(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        posexplode(bucketsUdf(col("embedding"))))
      .toDF("vec_id", "embedding", "table", "bucket")

  /** Distinct candidate pairs (id_a < id_b) colliding in ≥1 table,
    * via the bucket-pair pattern ([[graft.text.Dedup.bucketPairs]]):
    * ONE shuffle of the bucket table (vs the former two-sided
    * self-join), bounded O(maxBucket) aggregation buffers, pairs
    * emitted map-side. Over-cap buckets (an embedding cluster of
    * near-identical vectors) star-link to the bucket minimum — the
    * cosine verify downstream keeps precision exact. The bucket table
    * is persisted: each row costs Tables×BitsPerTable dot products
    * and the star pass re-scans it. */
  def lshCandidates(emb: DataFrame, maxBucket: Int = 1024): DataFrame = {
    val bk = graft.ops.SideCache.persist(
      buckets(emb).select("vec_id", "table", "bucket"))
    graft.text.Dedup.bucketPairs(bk, Seq("table", "bucket"), "vec_id",
        maxBucket, graft.text.Dedup.OverCap.Star)
      .distinct()
  }

  /** Embedding near-duplicate pairs: LSH candidates verified by exact
    * cosine ≥ threshold. Output (id_a, id_b, cos_x10k). */
  def lshNearDup(emb: DataFrame, minCos: Double): DataFrame = {
    val vecs = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    lshCandidates(emb)
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("norm").as("na")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("norm").as("nb")), Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"),
        floor(col("cos") * 10000 + lit(0.5)).as("cos_x10k"))
  }
}
