package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, LSH-bucketed search as the scale
  * path, and embedding-space near-dup pairs.
  *
  * Dot products / norms are sequential folds over the array in double
  * precision — built-in higher-order functions, codegen'd, deterministic
  * (same fold order every run, so results are reproducible bit-for-bit).
  */
object VectorOps {

  /** Sequential-fold dot product in double precision. */
  private val retrainLog =
    org.slf4j.LoggerFactory.getLogger("graft.VectorOps")

  /** Test seam for the [[retrainIvfIndex]] single-writer guard: runs
    * between the initial read and the whole-table rewrite — the window a
    * concurrent writer would race. Production no-op.
    */
  private[graft] var retrainMidpointHook: () => Unit = () => ()

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    cosinePrenormed(a, b, norm(a) * norm(b))

  /** Cosine with the norm product supplied by the caller — [[cosine]]
    * delegates here, so the expression tree (and thus the result) is
    * bit-identical whether norms are inline or hoisted. Use in pair joins
    * where each side's norm can be computed once per row instead of once
    * per pair.
    */
  private def cosinePrenormed(a: Column, b: Column, d: Column): Column =
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)

  /** Exact top-k by cosine similarity to one query vector. The plan is a
    * single scan + TakeOrderedAndProject — no shuffle of the corpus, the
    * per-partition top-k folds into a driver-side merge of k·partitions
    * rows.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    // deliberately NO repartition here: TakeOrderedAndProject already
    // reduces each input partition to k rows, so a shuffle in front of it
    // only adds cost — whatever parallelism the source has is what the
    // scan gets, and at scale the source is thousands-partitioned anyway
    val q = array(query.map(lit): _*)
    df.select(col(idCol),
        round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane components in [-1, 1), derived
    * from md5("plane#p/i") — computed ONCE at plan-build time and inlined
    * as literal arrays, so executors do zero hashing in the hot path and an
    * external SQL oracle (DuckDB) can reproduce the identical planes.
    */
  def planeComponents(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane#$p/$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = d.take(4).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(h, 16) % 2000000L).toDouble / 1000000.0 - 1.0
      }
    }

  /** Sign-random-projection LSH bucket of a vector: one bit per hyperplane
    * (sign of the projection), packed into a long.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (pl, p) =>
      val plc = array(pl.map(lit): _*)
      val proj = aggregate(
        zip_with(vec, plc, (x, c) => x.cast("double") * c),
        lit(0.0), (a, v) => a + v)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Loud dimensionality guard: a vector of the wrong length would zip_with
    * into nulls and silently collapse every bucket to 0 (degrading the LSH
    * join to all-pairs) — fail the query instead.
    */
  private def checkedVec(vec: Column, dim: Int): Column =
    when(size(vec) === dim, vec).otherwise(raise_error(concat(
      lit(s"graft LSH: expected $dim-dim vector, found dim="), size(vec).cast("string"))))

  /** The `numTables` × `planesPerTable` hyperplane family, sliced out of one
    * [[planeComponents]] call so an external SQL oracle reproduces the exact
    * constants by index.
    */
  def tableFamily(numTables: Int, planesPerTable: Int, dim: Int): Seq[Seq[Seq[Double]]] =
    planeComponents(numTables * planesPerTable, dim).grouped(planesPerTable).toSeq

  /** The whole hyperplane family as ONE literal datum
    * (array<array<array<double>>>, [table][plane][dim]) — the
    * [[centroidsLit]] principle applied to the LSH planes: unrolling one
    * expression subtree per (table, plane) puts tables × planes × dim
    * literal nodes into the plan (~4,500 nodes for the default 8×8×64
    * family), and every Catalyst analysis/optimization pass re-walks them —
    * measured as the dominant driver-side CONSTRUCTION cost of the embed
    * dedup/knn stages. A single literal plus `transform` loops keeps the
    * tree O(1) in family size with bit-identical arithmetic ([[bucketOf]]).
    */
  private def familyLit(numTables: Int, planesPerTable: Int, dim: Int): Column =
    typedlit(tableFamily(numTables, planesPerTable, dim))

  /** [[lshBucket]] with the plane set as a COLUMN (an element of
    * [[familyLit]]): per plane the same sequential zip_with/aggregate dot
    * fold, the same ascending-bit OR packing — bit-identical buckets in an
    * expression tree that is O(1) in planes × dim.
    */
  private def bucketOf(vec: Column, planes: Column): Column =
    aggregate(
      transform(planes, (pl, p) => {
        val proj = aggregate(
          zip_with(vec, pl, (x, c) => x.cast("double") * c),
          lit(0.0), (a, v) => a + v)
        when(proj >= 0.0, org.apache.spark.sql.graft.SparkShims.column(
          org.apache.spark.sql.catalyst.expressions.ShiftLeft(
            org.apache.spark.sql.graft.SparkShims.expr(lit(1L)),
            org.apache.spark.sql.graft.SparkShims.expr(p)))).otherwise(lit(0L))
      }),
      lit(0L), (a, b) => a.bitwiseOR(b))

  /** Approximate top-k via BANDED MULTI-TABLE sign-random-projection LSH:
    * `numTables` independent tables of `planesPerTable` planes each; a
    * vector is a candidate if it shares the query's bucket in ANY table
    * (union of probes — the same band shape as the MinHash text path).
    *
    * Scale: per-table bucket count is 2^planesPerTable — size planesPerTable
    * ≈ log2(corpusSize / targetBucketSize) so buckets stay small as the
    * corpus grows; recall is tuned INDEPENDENTLY by adding tables (miss
    * probability decays geometrically in numTables). A candidate's full
    * ranking is exact cosine, so precision is always exact.
    */
  def cosineTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numTables: Int = 8, planesPerTable: Int = 8): DataFrame = {
    val dim = query.length
    val tables = tableFamily(numTables, planesPerTable, dim)
    val q = array(query.map(lit): _*)
    // query buckets computed driver-side with the same plane constants
    val qBuckets = tables.map { pls =>
      pls.zipWithIndex.map { case (pl, p) =>
        val proj = pl.zip(query).map { case (c, x) => c * x }.sum
        if (proj >= 0.0) 1L << p else 0L
      }.reduce(_ | _)
    }
    val v = checkedVec(col(vecCol), dim)
    // literal family + loops (see [[familyLit]]): same per-table bucket
    // values, same any-table OR — tiny expression tree
    val anyTableMatch = exists(
      zip_with(transform(familyLit(numTables, planesPerTable, dim),
          pls => bucketOf(v, pls)),
        typedlit(qBuckets), (b, qb) => b === qb),
      m => m)
    PipelineUtil.spread(df).filter(anyTableMatch)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** KNN JOIN — top-k cosine neighbors in `corpus` for EVERY row of
    * `queries` (batch-query ANN; the vector analog of a lookup join, and
    * the primitive behind semantic dedup / batch retrieval where
    * [[cosineTopK]]'s single query vector doesn't apply).
    *
    * Shape: both sides key into the same `numTables` × `planesPerTable`
    * sign-LSH family ([[tableFamily]] — shared constants, so buckets are
    * compatible); candidates are the (table, bucket)-equijoin of the two
    * key sets — |tables| × bucket-local, NEVER all-pairs. Candidates are
    * ranked by exact cosine and cut to k per query with a window over
    * query_id. Like every LSH path here, recall is tuned by adding tables;
    * precision is exact.
    *
    * Scale: the keyed frames carry (id, table, bucket) only — vectors
    * rejoin for CANDIDATE pairs through AQE-sized joins (the candidate set
    * broadcast-converts when small, and the corpus is never shuffled). The
    * window shuffles candidate rows only, partitioned by query — O(queries
    * × bucket-mates), not O(corpus). A query colliding with nothing yields
    * no rows (ANN semantics — add tables or planes to tighten).
    */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String, k: Int,
      numTables: Int = 8, planesPerTable: Int = 8, dim: Int = 64): DataFrame = {
    val fam = familyLit(numTables, planesPerTable, dim)
    // norms ride the pinned frames — computed once per ROW here; the
    // verify join below then does one dot per candidate PAIR instead of
    // re-folding both norms per pair (a corpus row averages many pairs)
    val q = PipelineUtil.pin(PipelineUtil.spread(
      queries.select(col(qIdCol).as("query_id"),
        col(qVecCol).cast("array<double>").as("qv")))
      .withColumn("nq", norm(col("qv"))))
    val c = PipelineUtil.pin(PipelineUtil.spread(
      corpus.select(col(cIdCol).as("corpus_id"),
        col(cVecCol).cast("array<double>").as("cv")))
      .withColumn("nv", norm(col("cv"))))
    def keys(idName: String, vecName: String, df: DataFrame) = {
      val v = checkedVec(col(vecName), dim)
      // posexplode over the literal family: the position IS the table id,
      // so rows are identical to the per-table struct unrolling
      df.select(col(idName),
        posexplode(transform(fam, pls => bucketOf(v, pls)))
          .as(Seq("t", "bucket")))
    }
    val cands = keys("query_id", "qv", q).as("a")
      .join(keys("corpus_id", "cv", c).as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val scored = cands
      .join(q, "query_id")
      .join(c, "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosinePrenormed(col("qv"), col("cv"),
          col("nq") * col("nv")), 6).as("cosine_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    // filter the raw row_number (InferWindowGroupLimit → map-side per-query
    // top-k before the window shuffle), cast for the output schema after
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .withColumn("knn_rank", col("knn_rank").cast("long"))
  }

  /** The centroid set as ONE literal array-of-arrays datum. Keeping the
    * centroids in data rather than expression code matters at scale: per
    * centroid expressions would put C × dim literal nodes into codegen
    * (certain method-size blowup / interpreted fallback past a few dozen
    * centroids, impossible at the C ≈ 10k a 100-TB corpus wants), while a
    * single literal + `transform` loops over them with O(1) generated code.
    */
  private def centroidsLit(centroids: Seq[Seq[Double]]): Column =
    array(centroids.map(c => array(c.map(lit): _*)): _*)

  /** Centroids scaled to unit norm (zero centroids kept as-is): against a
    * FIXED probe vector v, dot(v, c/|c|) orders cells identically to
    * cosine(v, c) — |v| scales every cell equally — so assignment and
    * probe routing can use plain dots.
    */
  private def normedCents(centroids: Seq[Seq[Double]]): Seq[Seq[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }

  /** Semantic cluster assignment as a frame op: (id, cluster) by
    * nearest-centroid cosine ([[ivfAssign]]) against EXPLICIT centroids —
    * the building block of cluster-aware data curation (SemDeDup-style
    * pruning, cluster-balanced mixing via
    * [[TextOps.budgetSample]]). Centroids come from [[ivfCentroids]]
    * (trained) or any fixed set; the whole op is one codegen'd
    * projection, no shuffle.
    */
  def clusterAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    df.select(col(idCol), ivfAssign(col(vecCol), centroids).as("cluster"))

  /** Nearest-centroid assignment by cosine: index of the max similarity in
    * the per-centroid similarity array (`array_position` returns the FIRST
    * occurrence, so ties break to the smaller index, deterministically).
    *
    * Computed as argmax of dot(v, c/|c|): normalizing the centroids ONCE
    * driver-side drops both norm folds from the per-row loop (|v| scales
    * every candidate equally, so the argmax — and its first-occurrence
    * tie-break — is unchanged up to floating point), leaving C pure dot
    * products per row. On the build path this loop runs rows × C times —
    * it is the dominant index-build cost.
    *
    * Cross-version caveat: mathematical, not bit-level, equivalence —
    * a vector sitting on an EXACT floating-point tie between two cells
    * could route differently than under a previous code version's
    * arithmetic. Within one version, build, append and probe all share
    * this function, which is what correctness relies on; for indexes
    * persisted across versions, near-boundary vectors are the reason
    * nProbe > 1 is the default.
    */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dots = transform(centroidsLit(normedCents(centroids)), c => dot(vec, c))
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** IVF coarse quantizer training: deterministic seeding (the
    * `numCentroids` rows with the smallest md5(id) — a uniform,
    * reproducible sample) followed by `iterations` Lloyd steps, each one
    * distributed pass: assign → posexplode → per-(cluster, dim) average.
    * Driver holds only C×dim doubles. Empty clusters keep their previous
    * centroid.
    *
    * Scale: each Lloyd step is one scan + one shuffle of C×dim partial
    * sums (map-side combined) — the standard distributed k-means shape.
    * C ≈ sqrt(corpus) keeps both the assignment expression and the probe
    * lists balanced at 100-TB corpora.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, iterations: Int = 1): Seq[Seq[Double]] = {
    val seeds = df
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy("h").limit(numCentroids)
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    lloydSteps(df, vecCol, seeds, iterations)
  }

  /** `iterations` Lloyd steps from the given seed centroids — the shared
    * training core of [[ivfCentroids]] (md5-order seeds) and
    * [[retrainIvfIndex]] (seeded from the index's STORED centroids, so
    * retraining refines the existing partition instead of re-rolling it).
    * Empty cells keep their seed.
    */
  private def lloydSteps(df: DataFrame, vecCol: String,
      seeds: Seq[Seq[Double]], iterations: Int): Seq[Seq[Double]] =
    lloydLoop(df.select(col(vecCol).cast("array<double>").as("__lv")),
      seeds, iterations, cents => ivfAssign(col("__lv"), cents))

  /** The shared Lloyd mean-update loop: `frame` carries one `__lv`
    * array<double> column; `assign` maps the current centroid set to the
    * per-row assignment expression (cosine cells for [[lloydSteps]], L2
    * codes for [[pqLloyd]] — the ONLY difference between the two
    * trainings, so it is the one parameter). Empty cells keep their seed.
    */
  private def lloydLoop(frame: DataFrame, seeds: Seq[Seq[Double]],
      iterations: Int,
      assign: Seq[Seq[Double]] => Column): Seq[Seq[Double]] =
    (1 to iterations).foldLeft(seeds) { (cents, _) =>
      // the assignment MUST be its own projection below the explode:
      // a generator and a non-generator expression in one select put the
      // non-generator into the Project ABOVE the Generate, re-evaluating
      // the C×dim assignment once per exploded ELEMENT — a dim× blowup
      // of the dominant cost (measured 1356 s → ~7 s at dim=384, C=55,
      // 50k rows). Exploding the attribute keeps it once per row.
      val means = frame
        .select(assign(cents).as("c"), col("__lv"))
        .select(col("c"), posexplode(col("__lv")).as(Seq("p", "x")))
        .groupBy("c", "p").agg(avg("x").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents.zipWithIndex.map { case (old, ci) =>
        if (means.contains((ci, 0))) old.indices.map(p => means((ci, p))) else old
      }
    }

  /** Approximate top-k via an IVF (inverted-file) index: vectors are
    * coarse-quantized to their nearest centroid and only the `nProbe`
    * centroid cells closest to the query are searched exactly.
    *
    * Scale path: persist `df.withColumn("ivf_cluster", ivfAssign(...))`
    * partitioned by cluster (e.g. a graft table partitioned on
    * `ivf_cluster`) — then a query reads nProbe/numCentroids of the data
    * via partition pruning instead of filtering a full scan, and the
    * centroid table is broadcast-sized metadata. Recall is tuned by
    * nProbe; ranking within probes is exact cosine, so precision is
    * always exact.
    */
  def cosineTopKIvf(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numCentroids: Int = 16, nProbe: Int = 4,
      iterations: Int = 1): DataFrame = {
    val spreadDf = PipelineUtil.spread(df)
    val cents = ivfCentroids(spreadDf, idCol, vecCol, numCentroids, iterations)
    val probes = cents.zipWithIndex.map { case (c, i) =>
      val (dot, nc, nq) = (c.zip(query).map { case (a, b) => a * b }.sum,
        math.sqrt(c.map(x => x * x).sum), math.sqrt(query.map(x => x * x).sum))
      (if (nc * nq == 0) 0.0 else dot / (nc * nq), i)
    }.sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
    val q = array(query.map(lit): _*)
    val v = checkedVec(col(vecCol), query.length).cast("array<double>")
    spreadDf.filter(ivfAssign(v, cents).isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Persist an IVF index as a graft table PARTITIONED BY the coarse
    * cluster id, with the trained centroids stored in the table options.
    * At query time [[ivfIndexTopK]] filters on the partition column, so
    * the connector's partition pruning (not a full scan + filter) reads
    * only the probed cells — at a 100-TB corpus a query touches
    * nProbe/numCentroids of the data. Rebuild after large ingests to
    * re-balance cells (the assignment is a deterministic function of the
    * stored centroids, so incremental appends also route correctly by
    * computing the cluster column with [[ivfAssign]] on the same
    * centroids).
    */
  /** Auto-sized LSH family for a corpus of `n` vectors: planes keep
    * expected bucket occupancy ~32 rows (clamped 8..16), tables = planes
    * compensate per-table recall. Shared by [[nearDupPairs]] and the
    * persisted-index sidecar signatures.
    */
  private def autoFamilySize(n: Long): (Int, Int) = {
    val p = math.min(16, math.max(8,
      math.ceil(math.log(math.max(1L, n) / 32.0) / math.log(2.0)).toInt))
    (math.max(8, p), p)
  }

  /** Per-row LSH bucket array (one bucket per table) for the index
    * sidecar — the family is deterministic in (tables, planes, dim), so
    * batch-side signatures computed later always band compatibly.
    */
  private def lshBucketArray(v: Column, tables: Int, planes: Int,
      dim: Int): Column =
    transform(familyLit(tables, planes, dim), pls => bucketOf(v, pls))

  /** `lshSidecar = false` builds the pre-sidecar index layout (no
    * `lsh_buckets` column, `ivf.lsh.tables = 0`) — kept for migration
    * fixtures and compatibility tests of [[rebuildLshSidecar]]; production
    * builds always want the sidecar.
    */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String, path: String,
      numCentroids: Int = 16, iterations: Int = 1,
      maxCellRows: Long = 0L, lshSidecar: Boolean = true): graft.table.GraftTable = {
    val spreadDf = PipelineUtil.spread(df)
    val cents = ivfCentroids(spreadDf, idCol, vecCol, numCentroids, iterations)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    // LSH sidecar: each row stores its per-table sign-projection bucket,
    // computed ONCE at build. Semantic-dedup probes then join bucket-local
    // WITHIN probed cells instead of exact-scoring every cell row — the
    // measured difference at a 50k-batch × 450k-corpus probe is ~0.5G
    // cosine folds vs ~400k candidates. Family size rides the options so
    // appends and queries band compatibly.
    val (lshT, lshP) =
      if (lshSidecar) autoFamilySize(spreadDf.count()) else (0, 0)
    val v = col(vecCol).cast("array<double>")
    // cluster the write by the partition column: without this every write
    // task emits a file into every probed cell dir (tasks × C small files
    // + a stats pass each — the actual build bottleneck measured at 500k
    // rows / C=176); with it each cell is one task's contiguous write.
    val sidecarCols =
      if (lshT > 0) Seq(lshBucketArray(v, lshT, lshP, dim).as("lsh_buckets"))
      else Nil
    val clustered = spreadDf.select(
      Seq(col(idCol), col(vecCol)) ++ sidecarCols :+
        ivfAssign(v, cents).as("ivf_cluster"): _*)
    commitIvfTable(clustered, idCol, cents, path, maxCellRows,
      Map("ivf.vec-col" -> vecCol,
        "ivf.lsh.tables" -> lshT.toString, "ivf.lsh.planes" -> lshP.toString))
  }

  /** Shared commit tail of the IVF index builders: hot-cell salting, the
    * partitioned write, option pinning, and probe-scan split sizing.
    *
    * HOT-CELL SALTING: a skewed corpus can put a large fraction of rows in
    * one cell, making that cell a single straggler write task (and later a
    * straggler compaction unit) no matter how many executors exist. Count
    * rows per cell (one column-pruned agg, C rows to the driver) and give
    * any cell over the threshold `ceil(n/threshold)` salted sub-partitions
    * (`ivf_salt`, assigned per row by id hash — deterministic, so
    * re-ingests of the same id land on the same salt). Reads never filter
    * on the salt: pruning on `ivf_cluster` alone already skips every salt
    * directory of unprobed cells, so probe cost is unchanged — the salt
    * only bounds per-task/per-partition volume. The reference solves the
    * same problem for PK buckets with bucket rescale (reference:
    * paimon-spark procedure/RescaleProcedure.java); this is that idea at
    * the vector-index layer, with [[rebalanceIndex]] as the drift repair.
    */
  private def commitIvfTable(clustered: DataFrame, idCol: String,
      cents: Seq[Seq[Double]], path: String, maxCellRows: Long,
      extraOptions: Map[String, String]): graft.table.GraftTable = {
    // materialized twice (per-cell count collect, then the partitioned
    // write) — persist so centroid assignment, sidecar projections and SQ8
    // encoding compute once over the corpus at build time
    clustered.persist()
    try {
      val counts = clustered.groupBy("ivf_cluster").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val threshold = cellThreshold(maxCellRows, counts.values.sum, cents.size)
      val salts = saltPlan(counts, threshold)
      val assigned = clustered
        .withColumn("ivf_salt", saltExpr(col("ivf_cluster"), col(idCol), salts))
        .repartition(col("ivf_cluster"), col("ivf_salt"))
      val serialized = serializeCentroids(cents)
      val t = graft.table.GraftTable.create(
        clustered.sparkSession, path, assigned.schema,
        partitionKeys = Seq("ivf_cluster", "ivf_salt"),
        options = Map("ivf.centroids" -> serialized,
          "ivf.id-col" -> idCol, "ivf.salts" -> serializeSalts(salts),
          "ivf.max-cell-rows" -> maxCellRows.toString) ++ extraOptions)
      t.append(assigned)
      // probe-scan split sizing: an IVF index is read with QUERY-side fan-out
      // (every byte of a probed cell is scored once per query probing it), so
      // scan parallelism must track the CLUSTER, not the byte count — the
      // 128 MB default bin-packs a small-but-hot index into a handful of
      // splits and serializes the scoring. Size splits so the whole index
      // spreads over ~8× the session's cores, clamped to [4 MB, 128 MB]
      // (at a 100-TB corpus the cap restores the normal split size). The
      // byte count is EXACT and free — summed from the just-committed file
      // metadata, no extra pass over the input.
      val bytes = t.store.latestSnapshot
        .map(s => t.store.liveFiles(s).map(_.size).sum).getOrElse(0L)
      val cores = clustered.sparkSession.sparkContext.defaultParallelism
      val targetBytes = math.min(128L << 20,
        math.max(4L << 20, bytes / math.max(1, 8 * cores)))
      t.evolveBatch(Seq(
        t.setOptionT("source.split.target-size", targetBytes.toString),
        t.setOptionT("source.split.open-file-cost",
          math.max(256L << 10, targetBytes / 8).toString)))
      t
    } finally clustered.unpersist()
  }

  /** Effective per-cell row ceiling: explicit when given, else twice the
    * balanced mean cell size (a cell at 2x mean is where one write/compact
    * task starts lagging the fleet).
    */
  private def cellThreshold(maxCellRows: Long, total: Long, numCells: Int): Long =
    if (maxCellRows > 0) maxCellRows
    else math.max(1L, 2L * total / math.max(1, numCells))

  /** Cells needing >1 salt, with their salt counts (capped so a single
    * pathological cell cannot explode the partition count).
    */
  private def saltPlan(counts: Map[Int, Long], threshold: Long): Map[Int, Int] =
    counts.collect { case (cell, n) if n > threshold =>
      cell -> math.min(4096L, (n + threshold - 1) / threshold).toInt
    }

  /** Per-row salt: id-hash modulo the cell's salt count (1 — i.e. salt 0 —
    * for unsalted cells). The salted-cell map travels as one literal datum.
    */
  private def saltExpr(cluster: Column, id: Column, salts: Map[Int, Int]): Column =
    if (salts.isEmpty) lit(0)
    else pmod(hash(id), coalesce(element_at(typedLit(salts), cluster), lit(1)))

  private def serializeCentroids(cents: Seq[Seq[Double]]): String =
    cents.map(_.map(d => java.lang.Double.toString(d)).mkString(","))
      .mkString(";")

  private def parseCentroids(raw: String): Seq[Seq[Double]] =
    raw.split(';').toSeq.map(_.split(',').toSeq.map(_.toDouble))

  private def serializeSalts(salts: Map[Int, Int]): String =
    salts.toSeq.sorted.map { case (c, n) => s"$c:$n" }.mkString(";")

  private def parseSalts(s: String): Map[Int, Int] =
    if (s.isEmpty) Map.empty
    else s.split(';').map { e =>
      val Array(c, n) = e.split(':'); c.toInt -> n.toInt
    }.toMap

  /** The trained centroids + column names pinned in a persisted IVF
    * index's table options. Fails fast with a descriptive error on a table
    * that is not an IVF index (an index built with different parameters
    * must never be silently queried with defaults).
    */
  private def ivfMeta(index: graft.table.GraftTable)
      : (Seq[Seq[Double]], String, String) = {
    val raw = index.schema.option("ivf.centroids", "")
    require(raw.nonEmpty,
      s"table at ${index.location} is not an IVF index: missing 'ivf.centroids' " +
        "table option (build one with VectorOps.buildIvfIndex)")
    (parseCentroids(raw),
     index.schema.option("ivf.id-col", "id"),
     index.schema.option("ivf.vec-col", "vec"))
  }

  /** Vector dimensionality a persisted IVF index was trained on (from its
    * stored centroids) — lets callers parameterize batch-side ops (LSH
    * plane families, checked casts) without re-stating the dimension.
    */
  def ivfIndexDim(index: graft.table.GraftTable): Int =
    ivfMeta(index)._1.headOption.map(_.size).getOrElse(0)

  /** The persisted salt plan of an index ([[buildIvfIndex]] salting). */
  private def ivfSalts(index: graft.table.GraftTable): Map[Int, Int] =
    parseSalts(index.schema.option("ivf.salts", ""))

  /** Fold a new batch of vectors into a persisted IVF index: assignment is
    * a deterministic projection on the STORED centroids, so appends route
    * to the same cells as the original build — one partitioned append, no
    * retraining, no corpus read (the vector analog of
    * [[Dedup.appendToSigIndex]]). `commitIdentifier`/`commitUser` give
    * streaming `foreachBatch` ingest the same exactly-once replay filter
    * as the graft sink. Cells drift as the corpus grows; rebuild (or
    * re-cluster offline) when cell-size skew degrades probe cost.
    */
  def appendToIvfIndex(index: graft.table.GraftTable, df: DataFrame,
      idCol: String, vecCol: String, commitIdentifier: Long = -1L,
      commitUser: String = ""): Unit = {
    val (cents, storedId, storedVec) = ivfMeta(index)
    val salts = ivfSalts(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    // LSH sidecar of appended rows uses the STORED family size, so the
    // whole index stays band-compatible (indexes from before the sidecar
    // carry tables=0 and simply don't get the column)
    val lshT = index.schema.option("ivf.lsh.tables", "0").toInt
    val lshP = index.schema.option("ivf.lsh.planes", "0").toInt
    val base = PipelineUtil.spread(
      df.select(col(idCol).as(storedId), col(vecCol).as(storedVec)))
    val v = col(storedVec).cast("array<double>")
    val sigged =
      if (lshT > 0)
        base.withColumn("lsh_buckets", lshBucketArray(v, lshT, lshP, dim))
      else base
    val assigned = sigged
      .withColumn("ivf_cluster", ivfAssign(v, cents))
      .withColumn("ivf_salt", saltExpr(col("ivf_cluster"), col(storedId), salts))
      .repartition(col("ivf_cluster"), col("ivf_salt")) // one task per touched dir
    index.append(assigned, commitIdentifier = commitIdentifier,
      commitUser = commitUser)
  }

  /** Re-balance a persisted IVF index whose cells have drifted hot: per-cell
    * live row counts come FREE from commit metadata (no data read), cells
    * whose count demands a different salt fan-out than the stored plan are
    * rewritten — a partition-pruned read of JUST that cell, re-salted by id
    * hash, committed as a static-partition OVERWRITE (atomic per cell; reads
    * at any point see either the old or the new sub-partitioning, both
    * correct since queries never filter on the salt). Cells within plan are
    * untouched. Returns (cell, oldSalts, newSalts) for each rewritten cell.
    *
    * This is the drift-repair half of hot-cell handling ([[buildIvfIndex]]
    * salts at build time); centroid drift — cells whose CONTENT no longer
    * matches the stored centroids — still requires a rebuild, which this
    * deliberately does not do (retraining changes assignment and thus
    * retrieval results; re-salting never does).
    */
  def rebalanceIndex(index: graft.table.GraftTable,
      maxCellRows: Long = 0L): Seq[(Int, Int, Int)] = {
    val (cents, storedId, _) = ivfMeta(index)
    val stored = ivfSalts(index)
    val live = index.store.latestSnapshot
      .map(s => index.store.liveFiles(s)).getOrElse(Nil)
    val counts: Map[Int, Long] = live.groupBy(_.partition.head.toInt)
      .view.mapValues(_.map(_.liveRowCount).sum).toMap
    val explicitMax = if (maxCellRows > 0) maxCellRows
      else index.schema.option("ivf.max-cell-rows", "0").toLong
    // default ceiling over ALL trained centroids — the same denominator
    // the build used; counts.size (cells with live files) would shrink
    // with empty cells and make build/rebalance drift judgments disagree
    val threshold =
      cellThreshold(explicitMax, counts.values.sum, cents.size max 1)
    val desired = saltPlan(counts, threshold)
    val drifted = (stored.keySet ++ desired.keySet).toSeq.sorted
      .map(c => (c, stored.getOrElse(c, 1), desired.getOrElse(c, 1)))
      .filter { case (_, o, n) => o != n }
    drifted.foreach { case (cell, _, n) =>
      val cellDf = index.toDF
        .filter(col("ivf_cluster") === cell)
        .drop("ivf_salt")
        .withColumn("ivf_salt",
          saltExpr(col("ivf_cluster"), col(storedId), Map(cell -> n)))
        .repartition(col("ivf_cluster"), col("ivf_salt"))
      index.overwrite(cellDf, staticPartition = Map("ivf_cluster" -> cell.toString))
    }
    if (drifted.nonEmpty)
      index.evolveBatch(Seq(
        index.setOptionT("ivf.salts", serializeSalts(desired))))
    drifted
  }

  /** Re-train a persisted IVF index's centroids against its CURRENT
    * content — the drift repair [[rebalanceIndex]] deliberately does not
    * do. Appends route by the STORED centroids forever
    * ([[appendToIvfIndex]]), so as the embedding distribution drifts the
    * stored Voronoi cells stop matching the data: new-regime vectors pile
    * into whichever old cell is least-wrong, nearest-centroid probes stop
    * agreeing with true cosine neighborhoods, and recall decays at fixed
    * nProbe. This runs `iterations` Lloyd steps SEEDED FROM the stored
    * centroids (refining the existing partition, not re-rolling it) over
    * a deterministic sample of the index, then rewrites the whole index —
    * reassignment + a fresh salt plan; vector-derived columns (LSH
    * sidecar buckets, SQ8 codes) ride unchanged — in ONE atomic
    * whole-table OVERWRITE commit, and flips the centroid/salt options
    * last.
    *
    * QUANTIZED indexes retrain too: SQ8 and raw-PQ rows are re-clustered
    * from their approximate DECODES (reconstruction error = quantization
    * error, so the decodes carry the index's own geometry); codes are
    * cell-independent in those layouts and ride unchanged. Residual-PQ
    * indexes route to [[retrainPqResidual]], which also re-trains the
    * codebooks and re-encodes every code under a stamped-plan crash
    * protocol.
    *
    * Crash-safety (the [[rebuildLshSidecar]] options-flip-last ordering,
    * adapted to a moving-rows rewrite): the trained centroids are stamped
    * to `ivf.retrain.pending` BEFORE any data moves; the data commit is
    * atomic (readers see the old or the new assignment in full, never a
    * mix — each row exists exactly once at every point); the option flip
    * clears the stamp. A crash between data commit and flip leaves
    * queries probing by the old centroids (bounded recall loss, never
    * duplicates or data loss) — re-running resumes from the PENDING
    * centroids, re-applies the (idempotent) rewrite, and completes the
    * flip. Returns (centroid count, rows rewritten).
    *
    * SINGLE-WRITER CONTRACT (like the reference's dedicated-compaction
    * requirement): the whole-table OVERWRITE rewrites the rows READ at
    * the start of the retrain, so a concurrent append committed
    * mid-retrain would be silently dropped by the commit. The guard
    * below fails the retrain if the index's snapshot advanced between
    * the initial read and the rewrite — pause ingest (or route appends
    * through a retrain-aware coordinator) and rerun.
    *
    * A non-empty `ivf.retrain.pending` stamp means a previous run
    * crashed mid-rewrite: by default this call RESUMES those pending
    * centroids (logged; the current iterations/sampleFraction/reseed
    * arguments are ignored in favor of completing the stamped plan).
    * Pass `discardPending = true` to drop the stale stamp — e.g. after
    * killing a run whose parameters were wrong — and retrain fresh with
    * this call's arguments.
    */
  def retrainIvfIndex(index: graft.table.GraftTable, iterations: Int = 2,
      sampleFraction: Double = 1.0, seed: Long = 0L,
      maxCellRows: Long = 0L, reseed: Boolean = false,
      discardPending: Boolean = false): (Int, Long) = {
    require(iterations >= 1, s"iterations must be >=1: $iterations")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0,1]: $sampleFraction")
    val (oldCents, storedId, storedVec) = ivfMeta(index)
    val isSq = index.schema.option("ivf.sq.vmin", "").nonEmpty
    val isPq = index.schema.option("ivf.pq.books", "").nonEmpty
    // residual PQ is the one layout where codes MEAN something relative
    // to their cell — moving rows re-encodes them, which needs the
    // stronger stamped-plan crash protocol (below)
    if (isPq && pqResidual(index))
      return retrainPqResidual(index, iterations, sampleFraction, seed,
        maxCellRows, reseed, discardPending)
    val baseSnapshot = index.store.latestSnapshotId
    val raw = index.toDF
    // vector source: the stored full-precision column, or an approximate
    // decode for quantized layouts. SQ8 and raw-PQ codes are
    // CELL-INDEPENDENT, so a retrain only moves rows between cells —
    // codes ride unchanged, their meaning never shifts, and the
    // pending-centroids resume protocol stays valid at every crash point
    // (the decode of a half-retrained table is identical to the decode
    // of the original). Codebooks/affine params are NOT retrained here:
    // decodes carry no information the books don't already have; rebuild
    // from the source corpus when the quantization grid itself drifted.
    val (full, vecName) =
      if (raw.columns.contains(storedVec)) (raw, storedVec)
      else if (isSq) {
        val (vmin, vdiff) = sqMeta(index)
        (raw.withColumn("__rv",
          sqDecode(col("sq_code").cast("array<double>"), vmin, vdiff)), "__rv")
      } else if (isPq) {
        val (_, _, _, books) = pqMeta(index)
        (raw.withColumn("__rv", pqDecode(col("pq_code"), col("ivf_cluster"),
          books, residual = false, oldCents)), "__rv")
      } else throw new IllegalArgumentException(
        s"retrain_ivf: table at ${index.location} stores neither the " +
          s"vector column '$storedVec' nor a recognized quantized code " +
          "layout (sq_code / pq_code)")
    if (discardPending &&
        index.schema.option("ivf.retrain.pending", "").nonEmpty)
      index.evolveBatch(Seq(index.setOptionT("ivf.retrain.pending", "")))
    val pending = index.schema.option("ivf.retrain.pending", "")
    if (pending.nonEmpty)
      retrainLog.warn(s"retrainIvfIndex(${index.location}): resuming a " +
        "crashed run's pending centroids; this call's iterations/" +
        "sampleFraction/reseed arguments are ignored (pass " +
        "discardPending = true to drop the stamp and retrain fresh)")
    val cents =
      if (pending.nonEmpty) parseCentroids(pending) // resume a crashed run
      else {
        val sample =
          if (sampleFraction >= 1.0) full
          else full.sample(withReplacement = false, sampleFraction, seed)
        // GENTLE drift: refine from the stored centroids. HEAVY drift
        // (new-regime data near-orthogonal to every stored centroid) can
        // strand Lloyd in the old local minimum — `reseed` re-draws
        // md5-order seeds from the CURRENT content instead, giving
        // fresh-build-quality centroids without a rebuild.
        if (reseed) ivfCentroids(sample, storedId, vecName,
          oldCents.size, iterations)
        else lloydSteps(sample, vecName, oldCents, iterations)
      }
    if (pending.isEmpty)
      index.evolveBatch(Seq(index.setOptionT("ivf.retrain.pending",
        serializeCentroids(cents))))
    retrainMidpointHook()
    val v = col(vecName).cast("array<double>")
    // reassigned frame feeds the per-cell count AND the write — persist so
    // the C×dim assignment computes once per row
    val reassigned = full.drop("ivf_cluster", "ivf_salt")
      .withColumn("ivf_cluster", ivfAssign(v, cents)).persist()
    try {
      val counts = reassigned.groupBy("ivf_cluster").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val explicitMax = if (maxCellRows > 0) maxCellRows
        else index.schema.option("ivf.max-cell-rows", "0").toLong
      val threshold =
        cellThreshold(explicitMax, counts.values.sum, cents.size max 1)
      val salts = saltPlan(counts, threshold)
      val assigned = reassigned
        .withColumn("ivf_salt", saltExpr(col("ivf_cluster"), col(storedId), salts))
        .drop("__rv") // synthesized decode column, never persisted
        .repartition(col("ivf_cluster"), col("ivf_salt"))
      // single-writer guard (see the contract above): a commit that
      // advanced the snapshot since the initial read holds rows the
      // rewrite never saw — overwriting now would delete them. The early
      // check gives the friendly diagnosis; the OVERWRITE itself carries
      // the expected base id so the verify happens INSIDE the commit's
      // CAS loop (a commit landing between this check and the overwrite
      // fails the commit instead of being silently dropped).
      val nowSnapshot = index.store.latestSnapshotId
      require(nowSnapshot == baseSnapshot,
        s"retrainIvfIndex(${index.location}): index advanced from " +
          s"snapshot $baseSnapshot to $nowSnapshot during retrain — a " +
          "concurrent commit's rows are not in the rewritten frame and " +
          "the whole-table OVERWRITE would drop them. Retrain requires " +
          "exclusive write access; pause ingest and rerun (the pending " +
          "stamp makes the rerun resume deterministically).")
      index.overwrite(assigned, // whole table, one atomic commit
        expectedLatest = Some(baseSnapshot.getOrElse(0L)))
      index.evolveBatch(Seq(
        index.setOptionT("ivf.centroids", serializeCentroids(cents)),
        index.setOptionT("ivf.salts", serializeSalts(salts)),
        index.setOptionT("ivf.retrain.pending", "")))
      (cents.size, counts.values.sum)
    } finally reassigned.unpersist()
  }

  /** [[retrainIvfIndex]] for RESIDUAL PQ indexes — the layout where a
    * code's meaning depends on its cell. A retrain moves rows between
    * cells, so every code must be RE-ENCODED and the codebooks re-trained
    * on the new residuals. Because the rewrite changes what stored codes
    * MEAN, the pending stamp carries the COMPLETE new plan, all computed
    * BEFORE any write:
    *
    *  1. decode v̂ = book(code) + centroid(old cell) from the stored meta;
    *  2. train new centroids on v̂, assign new cells, train new books on
    *     (v̂ − centroid(new cell)), derive the salt plan;
    *  3. stamp `ivf.retrain.pending.q` = (base snapshot id, centroids,
    *     books, salts);
    *  4. re-encode + whole-table OVERWRITE with `expectedLatest = base`
    *     (the commit-level CAS: a racing commit FAILS the rewrite inside
    *     the commit loop instead of being silently dropped);
    *  5. flip the live options, clear the stamp.
    *
    * Crash/resume: stamp present + latest == base ⇒ the rewrite never
    * landed, codes still decode with the CURRENT options, so the resume
    * re-encodes deterministically from the stamped plan and retries 4-5.
    * latest == base+1 with an OVERWRITE head ⇒ the rewrite landed, only
    * the flip remains. Anything else ⇒ the single-writer contract was
    * violated mid-protocol: fail loud with a rebuild pointer. The window
    * between 4 and 5 serves approximate scores from new codes under old
    * books — bounded recall degradation (exact rerank per candidate is
    * unaffected), healed by the flip; never data loss or duplicates.
    */
  private def retrainPqResidual(index: graft.table.GraftTable,
      iterations: Int, sampleFraction: Double, seed: Long,
      maxCellRows: Long, reseed: Boolean,
      discardPending: Boolean): (Int, Long) = {
    val PendKey = "ivf.retrain.pending.q"
    if (discardPending && index.schema.option(PendKey, "").nonEmpty)
      index.evolveBatch(Seq(index.setOptionT(PendKey, "")))
    val pending = index.schema.option(PendKey, "")
    val (oldCents, storedId, _) = ivfMeta(index)
    val (m, codes, sub, oldBooks) = pqMeta(index)

    def flip(cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
        salts: Map[Int, Int]): Unit =
      index.evolveBatch(Seq(
        index.setOptionT("ivf.centroids", serializeCentroids(cents)),
        index.setOptionT("ivf.pq.books", serializeBooks(books)),
        index.setOptionT("ivf.salts", serializeSalts(salts)),
        index.setOptionT(PendKey, "")))

    // re-encode + CAS overwrite + flip from a stamped plan — valid ONLY
    // while the stored meta still describes the stored codes (i.e. the
    // overwrite has not landed yet: latest == base). The overwrite is
    // SIGNED with the stamp's token as its commitUser so a crashed run's
    // resume can verify the landed OVERWRITE is its own (a foreign
    // overwrite at base+1 — a rollback, a contract-violating writer — is
    // otherwise indistinguishable and the flip would install options
    // onto codes that were never re-encoded).
    def rewrite(base: Long, cents: Seq[Seq[Double]],
        books: Seq[Seq[Seq[Double]]], salts: Map[Int, Int],
        token: String): Unit = {
      val frame = index.toDF
        .withColumn("__rv", pqDecode(col("pq_code"), col("ivf_cluster"),
          oldBooks, residual = true, oldCents))
        .drop("ivf_cluster", "ivf_salt")
        .withColumn("ivf_cluster", ivfAssign(col("__rv"), cents))
      val rv = residualExpr(col("__rv"), col("ivf_cluster"), cents)
      val out = frame
        .withColumn("pq_code", pqEncode(rv, books, sub))
        .withColumn("ivf_salt",
          saltExpr(col("ivf_cluster"), col(storedId), salts))
        .drop("__rv")
        .repartition(col("ivf_cluster"), col("ivf_salt"))
      val nowSnapshot = index.store.latestSnapshotId.getOrElse(0L)
      require(nowSnapshot == base,
        s"retrainIvfIndex(${index.location}): index advanced from " +
          s"snapshot $base to $nowSnapshot during retrain — a concurrent " +
          "commit's rows are not in the rewritten frame. Retrain requires " +
          "exclusive write access; pause ingest and rerun (the pending " +
          "stamp makes the rerun resume deterministically).")
      index.overwrite(out, expectedLatest = Some(base),
        commitUser = if (token.isEmpty) "" else s"ivf-retrain-$token")
      flip(cents, books, salts)
    }

    if (pending.nonEmpty) {
      retrainLog.warn(s"retrainIvfIndex(${index.location}): resuming a " +
        "crashed quantized retrain's stamped plan; this call's " +
        "iterations/sampleFraction/reseed arguments are ignored (pass " +
        "discardPending = true ONLY if the rewrite never landed)")
      val parts = pending.split("#", -1)
      // 5-part stamps carry the rewrite-signing token; 4-part stamps are
      // pre-token (r18) and resume with the weaker kind-only heuristic
      require(parts.length == 4 || parts.length == 5,
        s"corrupt $PendKey stamp: $pending")
      val pbase = parts(0).toLong
      val cents = parseCentroids(parts(1))
      val books = parseBooks(parts(2))
      val salts = parseSalts(parts(3))
      val token = if (parts.length == 5) parts(4) else ""
      val cur = index.store.latestSnapshotId.getOrElse(0L)
      def rebuildError(why: String): Nothing = throw new IllegalStateException(
        s"retrainIvfIndex(${index.location}): crashed quantized retrain " +
          s"stamped at base snapshot $pbase, index at $cur — $why; " +
          "rebuild from the source corpus (buildIvfPqIndex)")
      // a table rolled back BELOW the stamped base (or with the base's
      // snapshots expired out from under the stamp) has codes the stamp
      // says nothing about — fail loud, never kinds.head on an empty seq
      if (cur < pbase) rebuildError(
        "the table was rolled back / truncated below the stamped base, " +
          "so the stamped plan no longer describes the stored codes")
      // what landed since the stamp decides what remains: the stamped
      // rewrite commits as ONE OVERWRITE with expectedLatest = pbase (the
      // commit-level CAS), so an OVERWRITE in (pbase, cur] at pbase + 1
      // is ours iff its commitUser carries the stamp's token
      val kinds = ((pbase + 1) to cur)
        .map(id => index.store.readSnapshot(id).commitKind)
      def overwriteIsOurs: Boolean = token.isEmpty || // legacy stamp
        index.store.readSnapshot(pbase + 1).commitUser == s"ivf-retrain-$token"
      if (cur == pbase) rewrite(pbase, cents, books, salts, token)
      else if (kinds.head == graft.core.CommitKind.OVERWRITE &&
          kinds.size == 1) {
        if (!overwriteIsOurs) rebuildError(
          "the OVERWRITE at the stamped base + 1 was not this retrain's " +
            "signed rewrite (a foreign overwrite violated the " +
            "single-writer contract); flipping options onto codes that " +
            "were never re-encoded would silently corrupt the index")
        flip(cents, books, salts) // rewrite landed; only the flip remains
      } else if (!kinds.contains(graft.core.CommitKind.OVERWRITE))
        // only appends landed and the rewrite never did: the stored meta
        // still describes every code (appends encode with the STORED
        // options), so re-encoding EVERYTHING at the current base with
        // the stamped plan is still exact — the appended rows simply
        // weren't in the salt-plan counts (bounded cell imbalance until
        // the next retrain, never wrong results)
        rewrite(cur, cents, books, salts, token)
      else rebuildError(
        s"commits landed AFTER the rewrite but before the option flip " +
          s"(kinds=${kinds.mkString(",")}) — those rows encoded with the " +
          "previous codebooks against rewritten neighbors")
      return (cents.size, index.toDF.count())
    }

    val base = index.store.latestSnapshotId.getOrElse(0L)
    val dfv = index.toDF
      .withColumn("__rv", pqDecode(col("pq_code"), col("ivf_cluster"),
        oldBooks, residual = true, oldCents)).persist()
    try {
      val sample =
        if (sampleFraction >= 1.0) dfv
        else dfv.sample(withReplacement = false, sampleFraction, seed)
      val cents =
        if (reseed) ivfCentroids(sample, storedId, "__rv",
          oldCents.size, iterations)
        else lloydSteps(sample, "__rv", oldCents, iterations)
      val assigned = dfv.drop("ivf_cluster", "ivf_salt")
        .withColumn("ivf_cluster", ivfAssign(col("__rv"), cents)).persist()
      try {
        val rv = residualExpr(col("__rv"), col("ivf_cluster"), cents)
        val books = (0 until m).map(j =>
          pqLloyd(assigned, storedId, slice(rv, j * sub + 1, sub),
            codes, iterations))
        val counts = assigned.groupBy("ivf_cluster").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val explicitMax = if (maxCellRows > 0) maxCellRows
          else index.schema.option("ivf.max-cell-rows", "0").toLong
        val threshold =
          cellThreshold(explicitMax, counts.values.sum, cents.size max 1)
        val salts = saltPlan(counts, threshold)
        // the token signs the rewrite commit (commitUser) so a resume can
        // prove the landed OVERWRITE is this plan's own
        val token = java.util.UUID.randomUUID().toString
        index.evolveBatch(Seq(index.setOptionT(PendKey,
          s"$base#${serializeCentroids(cents)}#${serializeBooks(books)}#" +
            s"${serializeSalts(salts)}#$token")))
        retrainMidpointHook()
        rewrite(base, cents, books, salts, token)
        (cents.size, counts.values.sum)
      } finally assigned.unpersist()
    } finally dfv.unpersist()
  }

  /** Upgrade an IVF index's LSH sidecar IN PLACE: pre-sidecar indexes
    * (built before the per-row `lsh_buckets` column existed, marked by
    * `ivf.lsh.tables = 0`) fall back to full-cell vs-corpus scoring — the
    * exact cost the sidecar removes (measured 145 s → 11.4 s at the 100×
    * probe). This rewrites each cell once with freshly computed buckets
    * (family auto-sized to the CURRENT corpus) and then flips the family
    * options, making the bucket-local path available without a rebuild.
    * Also usable on sidecar-carrying indexes to RE-SIZE a family the
    * corpus has outgrown.
    *
    * Crash-safe by ordering: the family options flip only AFTER every
    * cell is rewritten. A crash mid-rewrite leaves `ivf.lsh.tables`
    * unchanged, so queries keep their previous (correct) path — already
    * rewritten cells carry an ignored extra column until the next run
    * completes; per-cell overwrites are atomic exactly as in
    * [[rebalanceIndex]]. Returns the (tables, planes) family installed.
    */
  def rebuildLshSidecar(index: graft.table.GraftTable): (Int, Int) = {
    val (cents, _, storedVec) = ivfMeta(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    val live = index.store.latestSnapshot
      .map(s => index.store.liveFiles(s)).getOrElse(Nil)
    val total = live.map(_.liveRowCount).sum
    val (lshT, lshP) = autoFamilySize(total)
    if (!index.schema.fields.exists(_.name == "lsh_buckets"))
      index.addColumn("lsh_buckets",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))
    val cells = live.map(_.partition.head.toInt).distinct.sorted
    cells.foreach { cell =>
      val cellDf = index.toDF.filter(col("ivf_cluster") === cell)
        .withColumn("lsh_buckets",
          lshBucketArray(col(storedVec).cast("array<double>"), lshT, lshP, dim))
      index.overwrite(cellDf,
        staticPartition = Map("ivf_cluster" -> cell.toString))
    }
    index.evolveBatch(Seq(
      index.setOptionT("ivf.lsh.tables", lshT.toString),
      index.setOptionT("ivf.lsh.planes", lshP.toString)))
    (lshT, lshP)
  }

  /** Expire IVF-index rows whose id is NO LONGER in the corpus (the
    * vector half of takedown/GDPR propagation — see
    * [[Dedup.expireFromSigIndex]]). `liveIds` is the corpus id column.
    * Shape: one anti-join finds expired (id, cell) pairs, then ONLY the
    * touched cells are rewritten — a partition-pruned read of each cell
    * minus its expired ids, committed as a static-partition overwrite
    * (the [[rebalanceIndex]] per-cell pattern; atomic per cell, readers
    * see old-or-new, both correct). Untouched cells cost nothing; all
    * index columns (sidecar buckets, SQ8 codes) ride the rewrite
    * unchanged. Returns the number of rows expired.
    */
  def expireFromIvfIndex(index: graft.table.GraftTable,
      liveIds: DataFrame): Long = {
    val (_, storedId, _) = ivfMeta(index)
    val live = liveIds.select(col(liveIds.columns.head).as(storedId))
    val expired = index.toDF.select(col(storedId), col("ivf_cluster"))
      .join(live, Seq(storedId), "left_anti").persist()
    try {
      val n = expired.count()
      if (n == 0) return 0L
      // ≤ C cells — bounded driver collect, same as the rebalance path
      val touched = expired.select("ivf_cluster").distinct()
        .collect().map(_.getInt(0)).sorted
      touched.foreach { cell =>
        val gone = expired.filter(col("ivf_cluster") === cell).select(storedId)
        val cellDf = index.toDF.filter(col("ivf_cluster") === cell)
          .join(gone, Seq(storedId), "left_anti")
        index.overwrite(cellDf,
          staticPartition = Map("ivf_cluster" -> cell.toString))
      }
      n
    } finally expired.unpersist()
  }

  /** Top-k cosine query against a persisted IVF index: probes the nProbe
    * cells nearest the query via a partition-pruned scan.
    */
  def ivfIndexTopK(index: graft.table.GraftTable, query: Seq[Double], k: Int,
      nProbe: Int = 4): DataFrame = {
    val (cents, idCol, vecCol) = ivfMeta(index)
    val probes = cents.zipWithIndex.map { case (c, i) =>
      val (dot, nc, nq) = (c.zip(query).map { case (a, b) => a * b }.sum,
        math.sqrt(c.map(x => x * x).sum), math.sqrt(query.map(x => x * x).sum))
      (if (nc * nq == 0) 0.0 else dot / (nc * nq), i)
    }.sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
    val q = array(query.map(lit): _*)
    index.toDF.filter(col("ivf_cluster").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** KNN JOIN against a PERSISTED IVF index: every query row is routed to
    * its `nProbe` nearest centroid cells by a pure projection (centroids
    * are plan-time literals from the index's table options), then joined
    * to the index ON THE PARTITION COLUMN — the small probe side
    * broadcasts and Spark's runtime (join-driven) partition filtering
    * prunes the corpus scan to exactly the cells any query probes.
    * Exact cosine ranks candidates; a window cuts to k per query. This is
    * the batch analog of [[ivfIndexTopK]] — "retrieve top-k for tonight's
    * whole query set against the 100-TB corpus index" reads
    * |probed cells| / numCentroids of the data, never all of it.
    */
  def knnJoinIvf(queries: DataFrame, qIdCol: String, qVecCol: String,
      index: graft.table.GraftTable, k: Int, nProbe: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // rank filter directly over the un-cast row_number so Spark's
    // InferWindowGroupLimit inserts map-side per-query top-k BEFORE the
    // window shuffle; cast for the output schema afterwards
    ivfCandidates(queries, qIdCol, qVecCol, index, nProbe, index.toDF)
      .withColumn("knn_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("corpus_id"))))
      .filter(col("knn_rank") <= k)
      .withColumn("knn_rank", col("knn_rank").cast("long"))
  }

  /** Embedding near-dup pairs of `newDf` AGAINST a persisted IVF index —
    * the embedding-space analog of [[Dedup.nearDupPairsAgainst]] ("drop
    * new items that semantically duplicate the corpus"): each new vector
    * probes its `nProbe` nearest cells, scores exact cosine against ONLY
    * those cells' rows, and pairs at/above `threshold` (on the rounded
    * similarity) are reported. A row whose id equals the corpus id is
    * itself (a re-ingest), not a dup, and is excluded — mirroring the
    * text path.
    *
    * Approximate by design: a qualifying pair in an unprobed cell is
    * missed. At near-dup thresholds (≥ ~0.9) the two vectors are nearly
    * colinear, so they share a nearest cell unless they straddle a cell
    * boundary — `nProbe` is the recall lever, exactly as in retrieval.
    *
    * `view` optionally pins WHICH index state to band against (a
    * time-travel frame of `index`); defaults to the latest snapshot.
    * Crash-replaying ingest pipelines use it to exclude a batch's own
    * already-committed vectors ([[graft.streaming.StreamingDedup]]) —
    * banding a batch against itself can drop BOTH rows of a
    * near-threshold pair and shrink the survivor set on replay.
    */
  def embedNearDupAgainst(newDf: DataFrame, idCol: String, vecCol: String,
      index: graft.table.GraftTable, threshold: Double,
      nProbe: Int = 4, view: Option[DataFrame] = None): DataFrame = {
    val lshT = index.schema.option("ivf.lsh.tables", "0").toInt
    val idxDf = view.getOrElse(index.toDF)
    val candidates =
      if (lshT == 0) ivfCandidates(newDf, idCol, vecCol, index, nProbe, idxDf)
      else lshCellCandidates(newDf, idCol, vecCol, index, nProbe, lshT,
        index.schema.option("ivf.lsh.planes", "8").toInt, idxDf)
    candidates
      .filter(col("cosine_sim") >= threshold &&
        col("query_id") =!= col("corpus_id"))
      .select(col("query_id").as("new_id"), col("corpus_id"),
        col("cosine_sim"))
  }

  /** Bucket-local near-dup candidates against an index that carries the
    * LSH sidecar: batch rows band with corpus rows that share BOTH a
    * probed cell AND any table's sign bucket, and ONLY those pairs score
    * exact cosine. Against a 450k-corpus probe of a 50k batch this was
    * measured at ~400k verified candidates vs ~0.5G full-cell cosine
    * folds — the difference between "per-query √corpus" and "per-query
    * √corpus / 2^planes".
    *
    * Recall composes cell recall × LSH band recall: nearly-colinear pairs
    * (true near-dups) share their nearest cell and every sign bucket, so
    * planted/structural recall is exact; near-THRESHOLD pairs carry the
    * documented 1-(1-(1-θ/π)^p)^t band recall on top of the nProbe lever.
    */
  private def lshCellCandidates(newDf: DataFrame, qIdCol: String,
      qVecCol: String, index: graft.table.GraftTable, nProbe: Int,
      lshTables: Int, lshPlanes: Int, idxDf: DataFrame): DataFrame = {
    require(nProbe > 0, s"nProbe must be positive: $nProbe")
    val (cents, idCol, vecCol) = ivfMeta(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    val q = PipelineUtil.pin(PipelineUtil.spread(
      newDf.select(col(qIdCol).as("query_id"),
        checkedVec(col(qVecCol), dim).cast("array<double>").as("qv")))
      .withColumn("nq", norm(col("qv")))
      .withColumn("qb", transform(familyLit(lshTables, lshPlanes, dim),
        pls => bucketOf(col("qv"), pls))))
    val simStructs = transform(centroidsLit(normedCents(cents)),
      (c, i) => struct((-dot(col("qv"), c)).as("s"),
        i.cast("int").as("ivf_cluster")))
    // SLIM probe frame: (query_id, cell, table, bucket) — vectors stay in
    // the pinned q frame and rejoin for candidates only
    val probes = PipelineUtil.pin(q
      .select(col("query_id"), col("qb"),
        explode(slice(array_sort(simStructs),
          lit(1), lit(math.min(nProbe, cents.size)))).as("p"))
      .select(col("query_id"), col("p.ivf_cluster").as("ivf_cluster"),
        posexplode(col("qb")).as(Seq("t", "b"))))
    val probedCells: Seq[Int] = probes.select("ivf_cluster").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    // corpus side: (cell, id, table, bucket) from the SIDEcar — the scan
    // never touches vectors; pruned to the probed cells
    val corpusKeys = idxDf
      .filter(col("ivf_cluster").isin(probedCells.map(c => c: Any): _*))
      .select(col("ivf_cluster"), col(idCol).as("corpus_id"),
        posexplode(col("lsh_buckets")).as(Seq("t", "b")))
    val cands = probes.join(corpusKeys, Seq("ivf_cluster", "t", "b"))
      .select(col("query_id"), col("corpus_id")).distinct()
    // exact verify for candidates only: query vectors from the pinned q,
    // corpus vectors via a cell-pruned scan joined on the candidate ids
    // (ends in a distinct-shuffle, so AQE broadcast-converts when small)
    val corpusVecs = idxDf
      .filter(col("ivf_cluster").isin(probedCells.map(c => c: Any): _*))
      .select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("nv", norm(col("cv")))
    cands
      .join(q.select(col("query_id"), col("qv"), col("nq")), "query_id")
      .join(corpusVecs, "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosinePrenormed(col("qv"), col("cv"),
          col("nq") * col("nv")), 6).as("cosine_sim"))
  }

  /** Shared probe stage of the persisted-IVF query ops: route each query
    * row to its nProbe cells, prune the index scan to the probed cells,
    * and exact-score candidates — returns (query_id, corpus_id,
    * cosine_sim) with one row per (query, probed-cell row).
    */
  private def ivfCandidates(queries: DataFrame, qIdCol: String,
      qVecCol: String, index: graft.table.GraftTable, nProbe: Int,
      idxDf: DataFrame): DataFrame = {
    require(nProbe > 0, s"nProbe must be positive: $nProbe")
    val (cents, idCol, vecCol) = ivfMeta(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    val q = PipelineUtil.pin(PipelineUtil.spread(
      queries.select(col(qIdCol).as("query_id"),
        checkedVec(col(qVecCol), dim).cast("array<double>").as("qv"))
        .withColumn("nq", norm(col("qv")))))
    // per-query nProbe cells: structs of (-dot(qv, ĉ), cell) sort
    // ascending, so the FIRST nProbe entries are the nearest cells and
    // similarity ties break to the SMALLER cell id — same ordering and
    // tie-break as ivfIndexTopK (normalized-centroid dots order cells
    // like cosine; see [[normedCents]]). The centroids travel as one
    // literal datum (see [[centroidsLit]]) so generated code stays O(1)
    // in C, and routing is C dot folds per query, not 3C.
    val simStructs = transform(centroidsLit(normedCents(cents)),
      (c, i) => struct((-dot(col("qv"), c)).as("s"),
        i.cast("int").as("ivf_cluster")))
    // SLIM probe frame: (query_id, cell) only — the dim-sized query
    // vector must NOT ride the probe fan-out, or it is duplicated
    // nProbe× into the broadcast/exchange feeding the cell join
    // (measured ~1.2 GB of redundant bytes at 50k queries × nProbe 4 ×
    // 768 dims). Pinned: feeds both the probed-cell collect below and
    // the cell join.
    val probes = PipelineUtil.pin(q
      .select(col("query_id"),
        explode(slice(array_sort(simStructs),
          lit(1), lit(math.min(nProbe, cents.size)))).as("p"))
      .select(col("query_id"), col("p.ivf_cluster").as("ivf_cluster")))
    // EXPLICIT partition pruning: the distinct probed-cell set is tiny
    // (≤ C values) and known before the corpus is touched, so collect it
    // and push a static IN filter into the scan — the scan then reads
    // ONLY probed cells. Deterministic and always-on, unlike dynamic
    // partition pruning, which Spark only inserts when the build side has
    // a selective predicate (an exploded probe frame has none — measured:
    // without this the join full-scanned the index).
    val probedCells: Seq[Int] = probes.select("ivf_cluster").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    // corpus-row norms fold ONCE per scanned row, below the join — the
    // per-candidate work above is a single dot product (a probed cell's
    // row is scored once per query probing it)
    val corpus = idxDf
      .filter(col("ivf_cluster").isin(probedCells.map(c => c: Any): _*))
      .select(col("ivf_cluster"), col(idCol),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("nv", norm(col("cv")))
    // every probed-cell row is a candidate, so scoring must stay
    // COLOCATED with the corpus scan (shipping pairs to the vectors
    // would shuffle pairs × dim bytes): the query vectors broadcast
    // ONCE — queries × dim bytes total, an nProbe× reduction over the
    // old qv-carrying probe frame. Query sets too large to broadcast
    // belong on the LSH [[knnJoin]] path, whose candidates are
    // bucket-filtered before vectors rejoin.
    probes.join(corpus, "ivf_cluster")
      .join(broadcast(q.select(col("query_id"), col("qv"), col("nq"))),
        "query_id")
      .select(col("query_id"), col(idCol).as("corpus_id"),
        round(cosinePrenormed(col("qv"), col("cv"),
          col("nq") * col("nv")), 6).as("cosine_sim"))
  }

  /** Embedding near-dup pairs: banded multi-table LSH candidates (union
    * over tables, deduplicated) verified by exact cosine ≥ threshold. The
    * join is (table, bucket)-local — |tables| × Σ (bucket size choose 2),
    * never all-pairs.
    *
    * Scale shape: the self-joined frame carries only (id, table, bucket) —
    * 20 bytes per doc per table, pinned once — never the vectors; exact
    * cosine verification re-reads vectors for CANDIDATE ids only, through
    * an AQE-sized join that broadcast-converts when the candidate set is
    * small.
    *
    * `numTables = 0` / `planesPerTable = 0` (the defaults) AUTO-SCALE the
    * family with the input size: planes = clamp(8..16, log2(n/32)) keeps
    * expected bucket occupancy ~32 rows, and tables = planes compensates
    * the per-table recall the extra planes cost. A FIXED plane count
    * densifies quadratically as the corpus grows (measured: 50k vectors
    * at 8 planes produced ~40M candidate pairs and a 105 s verify;
    * auto-scaled, ~12× fewer candidates at BETTER multi-table recall).
    * Verification is exact-cosine either way, so precision never moves,
    * and planted colinear pairs share EVERY bucket at any plane count —
    * only near-threshold non-colinear recall trades off, in the
    * documented 1-(1-(1-θ/π)^p)^t way.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numTables: Int = 0, planesPerTable: Int = 0,
      dim: Int = 64): DataFrame = {
    val src0 = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val planes =
      if (planesPerTable > 0) planesPerTable
      else {
        val n = math.max(1L, src0.count())
        math.min(16, math.max(8,
          math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt))
      }
    val nTables = if (numTables > 0) numTables else math.max(8, planes)
    val src = PipelineUtil.spread(src0)
    val v = checkedVec(col("v"), dim)
    // lazy pins (PipelineUtil.pin): each frame below feeds two consumers;
    // pinning avoids recomputation WITHOUT eager job barriers. Keys come
    // from the literal family + posexplode (position = table id) — rows
    // identical to the per-table struct unrolling, tiny expression tree.
    val keyed = PipelineUtil.pin(
      src.select(col("id"),
        posexplode(transform(familyLit(nTables, planes, dim),
          pls => bucketOf(v, pls))).as(Seq("t", "bucket"))))
    val cands = PipelineUtil.pin(keyed.as("a").join(keyed.as("x"),
        col("a.t") === col("x.t") && col("a.bucket") === col("x.bucket") &&
          col("a.id") < col("x.id"))
      .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
      .distinct())
    val ids = cands.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val vecs = PipelineUtil.pin(src.join(ids, "id"))
    cands
      .join(vecs.toDF("id_a", "v_a"), "id_a")
      .join(vecs.toDF("id_b", "v_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  // ---------------------------------------------------------------- SQ8

  /** Per-dim affine SQ8 params trained on the corpus: (vmin, vdiff) with
    * code = round((v − vmin) / vdiff) ∈ [0, 255]. One shuffle of (dim, x)
    * pairs with map-side combine (partitions × dim rows reach the reduce)
    * — a build-time cost, like centroid training.
    */
  private def sqTrain(df: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val stats = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .collect().sortBy(_.getInt(0))
    require(stats.nonEmpty, "cannot train SQ8 on an empty corpus")
    val vmin = stats.map(_.getDouble(1)).toSeq
    val vdiff = stats.map { r =>
      val d = r.getDouble(2) - r.getDouble(1)
      if (d == 0.0) 1.0 else d / 255.0 // constant dim: every code is 0
    }.toSeq
    (vmin, vdiff)
  }

  /** Codegen'd SQ8 encoder: per-dim affine code, clamped so vectors
    * OUTSIDE the trained range (later appends) stay valid. The params
    * travel as single literal datums (see [[centroidsLit]] for why). */
  private def sqEncode(v: Column, vmin: Seq[Double], vdiff: Seq[Double]): Column =
    zip_with(
      zip_with(v, typedlit(vmin), (x, mn) => x - mn),
      typedlit(vdiff),
      (num, dv) => least(greatest(round(num / dv), lit(0.0)), lit(255.0))
        .cast("smallint"))

  /** The SQ8 affine params pinned in a quantized index's table options. */
  private def sqMeta(index: graft.table.GraftTable): (Seq[Double], Seq[Double]) = {
    val mn = index.schema.option("ivf.sq.vmin", "")
    require(mn.nonEmpty,
      s"table at ${index.location} is not an SQ8 IVF index: missing " +
        "'ivf.sq.vmin' table option (build one with VectorOps.buildIvfSqIndex)")
    (mn.split(',').toSeq.map(_.toDouble),
     index.schema.option("ivf.sq.vdiff", "").split(',').toSeq.map(_.toDouble))
  }

  /** Build a SCALAR-QUANTIZED (SQ8) IVF index: the cell layout (and
    * hot-cell salting) of [[buildIvfIndex]], but rows store an 8-bit
    * affine code of the vector (`array<smallint>`, 2 B/dim on disk vs
    * 8 B/dim float64 — probe scans read a quarter of the bytes; at a
    * 100-TB raw-vector corpus that difference IS the retrieval cost)
    * plus the EXACT row norm. Retrieval ([[knnJoinIvfSq]]) scores
    * approximate dots from the codes in codegen and reranks the top
    * `rerank × k` candidates per query exactly against the caller's
    * full-precision corpus — the FAISS IVF-SQ8 + refine architecture
    * (Jégou et al., PQ/IVFADC line of work; public literature), expressed
    * as partition-pruned Spark scans.
    *
    * The affine params (per-dim min / (max−min)/255) train on the build
    * corpus and ride the table options; appended vectors quantize with
    * the SAME stored params ([[appendToIvfSqIndex]]) so codes stay
    * comparable (out-of-range values clamp — retrain/rebuild when the
    * distribution drifts far enough to matter, exactly like centroids).
    */
  def buildIvfSqIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, numCentroids: Int = 16, iterations: Int = 1,
      maxCellRows: Long = 0L): graft.table.GraftTable = {
    val spreadDf = PipelineUtil.spread(df)
    val cents = ivfCentroids(spreadDf, idCol, vecCol, numCentroids, iterations)
    val (vmin, vdiff) = sqTrain(spreadDf, vecCol)
    val v = col(vecCol).cast("array<double>")
    val clustered = spreadDf.select(col(idCol),
      sqEncode(v, vmin, vdiff).as("sq_code"),
      norm(v).as("sq_norm"),
      ivfAssign(v, cents).as("ivf_cluster"))
    commitIvfTable(clustered, idCol, cents, path, maxCellRows,
      Map("ivf.sq.vmin" -> vmin.mkString(","),
        "ivf.sq.vdiff" -> vdiff.mkString(",")))
  }

  /** Fold a new batch into a persisted SQ8 index: quantize with the STORED
    * affine params, route by the STORED centroids — one partitioned
    * append, the quantized twin of [[appendToIvfIndex]]. */
  def appendToIvfSqIndex(index: graft.table.GraftTable, df: DataFrame,
      idCol: String, vecCol: String, commitIdentifier: Long = -1L,
      commitUser: String = ""): Unit = {
    val (cents, storedId, _) = ivfMeta(index)
    val (vmin, vdiff) = sqMeta(index)
    val salts = ivfSalts(index)
    val v = col(vecCol).cast("array<double>")
    val assigned = PipelineUtil.spread(df)
      .select(col(idCol).as(storedId),
        sqEncode(v, vmin, vdiff).as("sq_code"),
        norm(v).as("sq_norm"),
        ivfAssign(v, cents).as("ivf_cluster"))
      .withColumn("ivf_salt", saltExpr(col("ivf_cluster"), col(storedId), salts))
      .repartition(col("ivf_cluster"), col("ivf_salt"))
    index.append(assigned, commitIdentifier = commitIdentifier,
      commitUser = commitUser)
  }

  /** KNN JOIN against a persisted SQ8 IVF index, with exact rerank:
    *
    *  1. route each query to its `nProbe` cells (stored-centroid dots,
    *     exactly [[knnJoinIvf]]'s routing) and prune the index scan to the
    *     probed cells with a static partition IN-filter;
    *  2. score APPROXIMATE cosine from the 8-bit codes in codegen —
    *     dot(q, decode(code)) = dot(q, vmin) + Σ q[d]·vdiff[d]·code[d],
    *     so per candidate it is ONE fused multiply-add fold over the code
    *     (the q·vmin base and the q·vdiff scaled query are per-QUERY
    *     projections), divided by the stored EXACT row norm;
    *  3. keep the top `rerank × k` candidates per query (map-side window
    *     group limit), then rerank ONLY those exactly against the
    *     caller's full-precision corpus (the candidate set ends in a
    *     shuffle, so AQE broadcast-converts the rerank join when small).
    *
    * Scale shape: the probed-cell scan reads 2 B/dim codes instead of
    * 8 B/dim doubles; full-precision vectors are read for Q·rerank·k
    * candidate rows only. Output matches [[knnJoinIvf]]:
    * (query_id, corpus_id, cosine_sim, knn_rank).
    */
  def knnJoinIvfSq(queries: DataFrame, qIdCol: String, qVecCol: String,
      index: graft.table.GraftTable, corpus: DataFrame, cIdCol: String,
      cVecCol: String, k: Int, nProbe: Int = 4, rerank: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(rerank > 0, s"rerank must be positive: $rerank")
    val (cents, idCol, _) = ivfMeta(index)
    val (vmin, vdiff) = sqMeta(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    val q = PipelineUtil.pin(PipelineUtil.spread(
      queries.select(col(qIdCol).as("query_id"),
        checkedVec(col(qVecCol), dim).cast("array<double>").as("qv")))
      .withColumn("nq", norm(col("qv")))
      // per-QUERY pieces of the decoded dot: base = dot(qv, vmin) and the
      // vdiff-scaled query — both single projections over literal datums
      .withColumn("b0", aggregate(
        zip_with(col("qv"), typedlit(vmin), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("sqv", zip_with(col("qv"), typedlit(vdiff), (a, b) => a * b)))
    // probe routing + explicit probed-cell pruning — same shape (and
    // rationale) as [[ivfCandidates]]; carried columns differ, so the two
    // stay separate code paths
    val simStructs = transform(centroidsLit(normedCents(cents)),
      (c, i) => struct((-dot(col("qv"), c)).as("s"),
        i.cast("int").as("ivf_cluster")))
    // SLIM probe frame (see [[ivfCandidates]]): the dim-length scaled
    // query (sqv) must not fan out nProbe× — it broadcasts ONCE with the
    // per-query pieces after the cell join
    val probes = PipelineUtil.pin(q
      .select(col("query_id"),
        explode(slice(array_sort(simStructs),
          lit(1), lit(math.min(nProbe, cents.size)))).as("p"))
      .select(col("query_id"), col("p.ivf_cluster").as("ivf_cluster")))
    val probedCells: Seq[Int] = probes.select("ivf_cluster").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val codes = index.toDF
      .filter(col("ivf_cluster").isin(probedCells.map(c => c: Any): _*))
      .select(col("ivf_cluster"), col(idCol).as("corpus_id"),
        col("sq_code"), col("sq_norm"))
    val approxDot = col("b0") + aggregate(
      zip_with(col("sqv"), col("sq_code"), (s, c) => s * c),
      lit(0.0), (acc, x) => acc + x)
    val denom = col("nq") * col("sq_norm")
    val approx = probes.join(codes, "ivf_cluster")
      .join(broadcast(q.select(col("query_id"), col("nq"), col("b0"),
        col("sqv"))), "query_id")
      .select(col("query_id"), col("corpus_id"),
        when(denom === 0.0, 0.0).otherwise(approxDot / denom).as("approx_sim"))
    // raw row_number filtered pre-cast → InferWindowGroupLimit cuts to
    // rerank·k per query map-side, before the window shuffle
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx_sim").desc, col("corpus_id"))
    val cands = approx.withColumn("r", row_number().over(wa))
      .filter(col("r") <= rerank * k)
      .select("query_id", "corpus_id")
    val c = PipelineUtil.pin(PipelineUtil.spread(
      corpus.select(col(cIdCol).as("corpus_id"),
        col(cVecCol).cast("array<double>").as("cv")))
      .withColumn("nv", norm(col("cv"))))
    val exact = cands
      .join(q.select(col("query_id"), col("qv"), col("nq")), "query_id")
      .join(c, "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosinePrenormed(col("qv"), col("cv"),
          col("nq") * col("nv")), 6).as("cosine_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine_sim").desc, col("corpus_id"))
    exact.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .withColumn("knn_rank", col("knn_rank").cast("long"))
  }

  // ---- IVF-PQ: product quantization + exact rerank (the FAISS
  // IVFPQ/refine analog; Jégou et al. 2011 "Product Quantization for
  // Nearest Neighbor Search"). SQ8 stores 1 byte per DIMENSION; PQ stores
  // 1 byte per SUBSPACE (m bytes/vector, dim/m dims each) — at dim=384,
  // m=16 that is 16 B/vector vs 384 B SQ8 vs 3 KB float64, the next
  // compression tier when probe-scan bytes ARE the retrieval cost. ----

  /** L2 code assignment within one subspace: index of the codebook entry
    * minimizing ||sv − c||² — PQ trains/encodes in L2 (reconstruction
    * error), unlike the COSINE cell routing ([[ivfAssign]]): a
    * low-magnitude subvector must map to a low-magnitude code, which
    * cosine ignores. One fused fold per codebook entry; ties → lowest
    * index (array_min on (dist, i) structs).
    */
  private def pqAssign(sv: Column, codebook: Seq[Seq[Double]]): Column =
    array_min(transform(centroidsLit(codebook), (c, i) =>
      struct(aggregate(zip_with(sv, c, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("s"),
        i.cast("int").as("i")))).getField("i")

  /** L2 Lloyd steps over ONE subspace slice (md5-order seeds, the
    * [[ivfCentroids]] convention): the cosine [[lloydSteps]] twin with
    * [[pqAssign]] as the assignment. Same generator-extraction shape —
    * the assignment stays its own projection below the explode. Empty
    * cells keep their seed.
    */
  private def pqLloyd(df: DataFrame, idCol: String, sv: Column,
      codes: Int, iterations: Int): Seq[Seq[Double]] = {
    val sub = df.select(col(idCol).as("__id"), sv.as("__lv"))
    val seeds = sub.select(col("__lv"), md5(col("__id").cast("string")).as("h"))
      .orderBy("h").limit(codes)
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    lloydLoop(sub.select(col("__lv")), seeds, iterations,
      cents => pqAssign(col("__lv"), cents))
  }

  /** Codegen'd PQ encoder: the m-length code array, one L2 argmin per
    * subspace slice. Build/append-time only — retrieval never decodes.
    */
  private def pqEncode(v: Column, books: Seq[Seq[Seq[Double]]],
      sub: Int): Column =
    array(books.zipWithIndex.map { case (bk, j) =>
      pqAssign(slice(v, j * sub + 1, sub), bk).cast("smallint")
    }: _*)

  private def serializeBooks(books: Seq[Seq[Seq[Double]]]): String =
    books.map(serializeCentroids).mkString("|")

  private def parseBooks(raw: String): Seq[Seq[Seq[Double]]] =
    raw.split('|').toSeq.map(parseCentroids)

  /** Approximate decode of an SQ8 code back to a vector (per-dim affine
    * inverse) — retrain's vector source when the original was never
    * stored: reconstruction error is exactly the quantization error, so
    * clustering the decodes is clustering the index's own geometry.
    */
  private def sqDecode(code: Column, vmin: Seq[Double],
      vdiff: Seq[Double]): Column =
    zip_with(zip_with(code, typedlit(vdiff), (c, dv) => c * dv),
      typedlit(vmin), (x, mn) => x + mn)

  /** Approximate decode of a PQ code: per-subspace codebook
    * reconstruction, plus the row's OLD cell centroid for residual codes.
    */
  private def pqDecode(code: Column, cluster: Column,
      books: Seq[Seq[Seq[Double]]], residual: Boolean,
      cents: Seq[Seq[Double]]): Column = {
    val recon = flatten(array(books.zipWithIndex.map { case (bk, j) =>
      element_at(centroidsLit(bk), element_at(code, j + 1).cast("int") + 1)
    }: _*))
    if (residual)
      zip_with(recon, element_at(centroidsLit(cents), cluster + 1),
        (a, b) => a + b)
    else recon
  }

  /** v − centroid(cell), the FAISS-style IVFPQ residual: a literal-datum
    * centroid lookup + one zip_with — a pure codegen projection. Residual
    * codebooks only need to span WITHIN-cell variance, so the same m
    * bytes reconstruct materially tighter than raw-vector codebooks
    * whenever the corpus actually clusters.
    */
  private def residualExpr(v: Column, cluster: Column,
      cents: Seq[Seq[Double]]): Column =
    zip_with(v, element_at(centroidsLit(cents), cluster + 1), (a, b) => a - b)

  /** Whether a PQ index stores residual codes (`ivf.pq.residual`). */
  private def pqResidual(index: graft.table.GraftTable): Boolean =
    index.schema.option("ivf.pq.residual", "false").toBoolean

  /** The PQ codebooks pinned in a quantized index's table options:
    * (m, codes, sub, books). */
  private def pqMeta(index: graft.table.GraftTable)
      : (Int, Int, Int, Seq[Seq[Seq[Double]]]) = {
    val raw = index.schema.option("ivf.pq.books", "")
    require(raw.nonEmpty,
      s"table at ${index.location} is not a PQ IVF index: missing " +
        "'ivf.pq.books' table option (build one with VectorOps.buildIvfPqIndex)")
    val books = raw.split('|').toSeq.map(parseCentroids)
    (books.size, books.head.size, books.head.head.size, books)
  }

  /** Build a PRODUCT-QUANTIZED IVF index: the cell layout (and hot-cell
    * salting) of [[buildIvfIndex]], but rows store an m-byte PQ code
    * (`array<smallint>` of sub-space codebook indices; parquet
    * dictionary+bit-packing stores the ≤`codes`-valued entries at ~1 B
    * each on disk) plus the EXACT row norm. `dim` must divide evenly
    * into `m` subspaces; each subspace trains its own `codes`-entry L2
    * codebook over the corpus (md5-order seeds — deterministic).
    * Retrieval ([[knnJoinIvfPq]]) scores by ADC table lookups and
    * reranks exactly. Codebook storage is dim·codes doubles in the table
    * options (~100 KB at dim=64, codes=256) — metadata-sized, read once
    * per query batch.
    *
    * `residual = true` (the DEFAULT, matching FAISS IVFPQ): codebooks
    * train on and codes store (v − centroid(cell)) instead of v — the
    * same m bytes buy materially better recall on clustered corpora
    * because each codebook only spans within-cell variance. Retrieval
    * shifts the ADC sum by dot(q, centroid(cell)) per (query, probed
    * cell) — still a literal-datum projection over ≤ nProbe cells per
    * query. Pass `residual = false` for the raw-vector encoding;
    * existing indexes keep their stored flag (appends route by it).
    */
  def buildIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, numCentroids: Int = 16, iterations: Int = 1,
      m: Int = 8, codes: Int = 256, maxCellRows: Long = 0L,
      residual: Boolean = true): graft.table.GraftTable = {
    require(m > 0 && codes > 1 && codes <= 256,
      s"bad PQ params m=$m codes=$codes")
    // centroid training + m codebook trainings each re-scan the corpus
    // (m·(iterations+1) passes) — persist the source for the training
    // phase; commitIvfTable persists the ENCODED frame separately
    val spreadDf = PipelineUtil.spread(df).persist()
    try {
      val cents = ivfCentroids(spreadDf, idCol, vecCol, numCentroids, iterations)
      val dim = cents.headOption.map(_.size).getOrElse(0)
      require(dim > 0 && dim % m == 0, s"dim=$dim not divisible into m=$m subspaces")
      val sub = dim / m
      val v = col(vecCol).cast("array<double>")
      // cells are assigned BEFORE codebook training: residual mode trains
      // on (v − centroid(cell)), and raw mode rides the same persisted
      // frame so the m trainings never recompute the C×dim assignment
      val assigned = spreadDf.select(col(idCol), v.as("__v"),
        ivfAssign(v, cents).as("ivf_cluster")).persist()
      try {
        val ev = if (residual)
          residualExpr(col("__v"), col("ivf_cluster"), cents)
        else col("__v")
        val books = (0 until m).map(j =>
          pqLloyd(assigned, idCol, slice(ev, j * sub + 1, sub), codes, iterations))
        val clustered = assigned.select(col(idCol),
          pqEncode(ev, books, sub).as("pq_code"),
          norm(col("__v")).as("pq_norm"),
          col("ivf_cluster"))
        commitIvfTable(clustered, idCol, cents, path, maxCellRows,
          Map("ivf.pq.books" -> serializeBooks(books)) ++
            (if (residual) Map("ivf.pq.residual" -> "true") else Map.empty))
      } finally assigned.unpersist()
    } finally spreadDf.unpersist()
  }

  /** Fold a new batch into a persisted PQ index: encode with the STORED
    * codebooks, route by the STORED centroids — one partitioned append,
    * the PQ twin of [[appendToIvfSqIndex]]. */
  def appendToIvfPqIndex(index: graft.table.GraftTable, df: DataFrame,
      idCol: String, vecCol: String, commitIdentifier: Long = -1L,
      commitUser: String = ""): Unit = {
    val (cents, storedId, _) = ivfMeta(index)
    val (_, _, sub, books) = pqMeta(index)
    val salts = ivfSalts(index)
    val v = col(vecCol).cast("array<double>")
    val base = PipelineUtil.spread(df).select(col(idCol).as(storedId),
      v.as("__v"), ivfAssign(v, cents).as("ivf_cluster"))
    val ev = if (pqResidual(index))
      residualExpr(col("__v"), col("ivf_cluster"), cents)
    else col("__v")
    val assigned = base
      .select(col(storedId),
        pqEncode(ev, books, sub).as("pq_code"),
        norm(col("__v")).as("pq_norm"),
        col("ivf_cluster"))
      .withColumn("ivf_salt", saltExpr(col("ivf_cluster"), col(storedId), salts))
      .repartition(col("ivf_cluster"), col("ivf_salt"))
    index.append(assigned, commitIdentifier = commitIdentifier,
      commitUser = commitUser)
  }

  /** KNN JOIN against a persisted PQ IVF index, with exact rerank —
    * [[knnJoinIvfSq]]'s shape at the next compression tier:
    *
    *  1. route each query to its `nProbe` cells and prune the index scan
    *     to them with a static partition IN-filter (identical routing);
    *  2. score APPROXIMATE cosine by ASYMMETRIC DISTANCE COMPUTATION:
    *     per query, ONE m·codes-length table of subspace dots
    *     T[j·codes + c] = dot(q_subj, book_j[c]) is computed as a
    *     projection over literal codebook datums and broadcast with the
    *     query; per candidate the approximate dot is m table LOOKUPS
    *     (`transform` with the position index + element_at — no
    *     per-candidate multiply at all), divided by the stored exact row
    *     norm; residual indexes add a per-(query, probed cell)
    *     dot(q, centroid) shift carried on the slim probe frame;
    *  3. keep the top `rerank × k` per query map-side
    *     (InferWindowGroupLimit), rerank ONLY those exactly against the
    *     caller's full-precision corpus.
    *
    * Scale shape: probed cells are read at ~m bytes/vector; per-candidate
    * work is m lookups instead of dim FMAs; full-precision vectors are
    * read for Q·rerank·k rows only. Output matches [[knnJoinIvf]]:
    * (query_id, corpus_id, cosine_sim, knn_rank).
    */
  def knnJoinIvfPq(queries: DataFrame, qIdCol: String, qVecCol: String,
      index: graft.table.GraftTable, corpus: DataFrame, cIdCol: String,
      cVecCol: String, k: Int, nProbe: Int = 4, rerank: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(rerank > 0, s"rerank must be positive: $rerank")
    val (cents, idCol, _) = ivfMeta(index)
    val (_, codes, sub, books) = pqMeta(index)
    val dim = cents.headOption.map(_.size).getOrElse(0)
    // the per-query ADC table: subspace-j dots against every codebook
    // entry, flattened to one m·codes array — a single projection over
    // literal datums, the PQ analog of SQ8's (b0, sqv) pieces
    val adcTable = flatten(array(books.zipWithIndex.map { case (bk, j) =>
      transform(centroidsLit(bk),
        c => dot(slice(col("qv"), j * sub + 1, sub), c))
    }: _*))
    val q = PipelineUtil.pin(PipelineUtil.spread(
      queries.select(col(qIdCol).as("query_id"),
        checkedVec(col(qVecCol), dim).cast("array<double>").as("qv")))
      .withColumn("nq", norm(col("qv")))
      .withColumn("adc", adcTable))
    val simStructs = transform(centroidsLit(normedCents(cents)),
      (c, i) => struct((-dot(col("qv"), c)).as("s"),
        i.cast("int").as("ivf_cluster")))
    // SLIM probe frame (see [[ivfCandidates]]): the m·codes ADC table
    // must not fan out nProbe× — it broadcasts ONCE after the cell join.
    // Residual indexes score dot(q, v−c(cell)) through the ADC table; the
    // missing dot(q, c(cell)) term is a per-(query, probed-cell) SHIFT
    // computed here, where the probe row still carries qv — one
    // literal-datum dot per probe row, the frame grows by one double.
    val residual = pqResidual(index)
    val probes = PipelineUtil.pin(q
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(simStructs),
          lit(1), lit(math.min(nProbe, cents.size)))).as("p"))
      .select(col("query_id"), col("p.ivf_cluster").as("ivf_cluster"),
        (if (residual)
          dot(col("qv"),
            element_at(centroidsLit(cents), col("p.ivf_cluster") + 1))
        else lit(0.0)).as("adc_shift")))
    val probedCells: Seq[Int] = probes.select("ivf_cluster").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val codesDf = index.toDF
      .filter(col("ivf_cluster").isin(probedCells.map(c => c: Any): _*))
      .select(col("ivf_cluster"), col(idCol).as("corpus_id"),
        col("pq_code"), col("pq_norm"))
    val approxDot = aggregate(
      transform(col("pq_code"),
        (c, j) => element_at(col("adc"), (j * codes + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    val denom = col("nq") * col("pq_norm")
    val approx = probes.join(codesDf, "ivf_cluster")
      .join(broadcast(q.select(col("query_id"), col("nq"), col("adc"))),
        "query_id")
      .select(col("query_id"), col("corpus_id"),
        when(denom === 0.0, 0.0)
          .otherwise((col("adc_shift") + approxDot) / denom).as("approx_sim"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx_sim").desc, col("corpus_id"))
    val cands = approx.withColumn("r", row_number().over(wa))
      .filter(col("r") <= rerank * k)
      .select("query_id", "corpus_id")
    val c = PipelineUtil.pin(PipelineUtil.spread(
      corpus.select(col(cIdCol).as("corpus_id"),
        col(cVecCol).cast("array<double>").as("cv")))
      .withColumn("nv", norm(col("cv"))))
    val exact = cands
      .join(q.select(col("query_id"), col("qv"), col("nq")), "query_id")
      .join(c, "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosinePrenormed(col("qv"), col("cv"),
          col("nq") * col("nv")), 6).as("cosine_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine_sim").desc, col("corpus_id"))
    exact.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .withColumn("knn_rank", col("knn_rank").cast("long"))
  }
}
