package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-construction operators — the steps between "raw documents" and
  * "training shards" that a large-scale LLM data pipeline runs after
  * dedup/quality scoring (SURVEY.md LLM-pipeline section; extends
  * [[Dedup]]/[[TextAnalysis]]):
  *
  *   - duplicate-CLUSTER resolution: candidate pairs (minhash/simhash)
  *     are edges, and the pipeline needs connected components to pick one
  *     survivor per cluster — pairs alone can't (a~b, b~c must collapse
  *     to ONE cluster even when a~c was never a candidate);
  *   - sequence packing: lay documents end-to-end and cut fixed
  *     token-budget training sequences (the concat-and-chunk packing
  *     used to build pretraining batches);
  *   - repetition quality (Gopher-style duplicate-word / top-bigram
  *     fractions), BM25 relevance scoring over an inverted index,
  *     deterministic per-stratum sampling, and overlapping token-window
  *     chunking for retrieval corpora.
  *
  * Everything is shuffle-based dataflow (no driver-side state on the data
  * path); the only driver actions are CC's per-round convergence check
  * and packing's per-partition totals (one tiny row per partition).
  */
object Corpus {

  /** Word `n`-gram array over a pre-split `ws` column — the ONE
    * definition every word-gram operator here shares (crossDocRepeats,
    * decontaminate's shingleRows, gopherRules, spanCut, splitLeakage,
    * corpusDiversity), so a tokenization tweak can never silently fork
    * between operators and their oracles. Callers must either filter
    * `size(ws) >= n` first or use [[wordGramExprGuarded]] —
    * `sequence(1, m)` runs DESCENDING when m < 1, never empty.
    */
  private[operators] def wordGramExpr(n: Int): String =
    s"transform(sequence(1, size(ws) - ${n - 1}), " +
      s"i -> concat_ws(' ', transform(sequence(i, i + ${n - 1}), j -> element_at(ws, j))))"

  /** [[wordGramExpr]] short-circuiting docs shorter than `n` to an
    * empty array, for callers that must KEEP short docs in the output. */
  private[operators] def wordGramExprGuarded(n: Int): String =
    s"IF(size(ws) < $n, CAST(array() AS ARRAY<STRING>), ${wordGramExpr(n)})"

  /** Connected components by min-label propagation — resolves candidate
    * duplicate PAIRS into duplicate CLUSTERS: every vertex converges to
    * the smallest vertex id reachable from it, which is the component's
    * canonical (keeper) id.
    *
    * Pregel-style rounds: each vertex takes the min of its own label and
    * its neighbors' labels until a fixpoint — O(component diameter)
    * rounds of one equi-join + one aggregation, each a plain shuffle that
    * scales with executors. Duplicate-cluster graphs have tiny diameters
    * (docs in a cluster share most shingles, so LSH emits near-cliques);
    * for adversarial long-chain graphs swap in the O(log n)
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce", SoCC'14) — same join-shape, more rounds of
    * bookkeeping. `localCheckpoint` truncates lineage each round so plan
    * depth stays O(1) instead of O(rounds).
    *
    * Throws after `maxIter` rounds rather than returning silently-wrong
    * labels. Output: one row per vertex appearing in any pair —
    * (vertex, cluster) with cluster = min id of its component.
    *
    * Pair sets up to `driverThreshold` run union-find on the DRIVER
    * instead (one bounded collect, identical output): candidate-pair
    * graphs are tiny relative to their corpus, and a 50-pair graph
    * should not pay half a dozen Spark jobs of propagation rounds — the
    * same explicit bounded-collect-with-distributed-fallback shape as
    * the JDBC lookup's maxKeys. Set it to 0 to force the distributed
    * path.
    */
  /** One majority-vote label-propagation step over a near-dup pair
    * graph — the semi-supervised move that spreads a trusted label
    * (quality verdict, license class, language tag) from labeled
    * documents onto their unlabeled near-duplicates. Completes the
    * hash-verified one-deterministic-iterate family (q155 Lloyd step,
    * q156 gradient step): the converged multi-round propagation is
    * order-sensitive, but a single synchronous step is exact in any
    * engine. Majority with ties to the smallest label; nodes with no
    * labeled neighbor stay out of the output.
    *
    * Dataflow: symmetrize the (already candidate-bounded) pair list,
    * one join against the seed-label table, one (node, label) count
    * aggregation, one per-node argmax window over ≤ degree rows — all
    * bounded by the edge list, never the corpus.
    */
  def labelPropagationStep(pairs: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val edges = pairs.select(col(aCol).as("node"), col(bCol).as("nbr"))
      .union(pairs.select(col(bCol).as("node"), col(aCol).as("nbr")))
    val seed = labels.select(col(idCol).as("nbr"), col(labelCol).as("lbl"))
    val votes = edges
      .join(seed, "nbr") // labeled neighbors only
      .join(seed.select(col("nbr").as("node")), Seq("node"), "left_anti")
      .groupBy(col("node"), col("lbl"))
      .agg(count(lit(1)).as("votes"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("node"))
    val wBest = org.apache.spark.sql.expressions.Window.partitionBy(col("node"))
      .orderBy(col("votes").desc, col("lbl"))
    votes
      .withColumn("n_labeled", sum(col("votes")).over(wTot))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("node").as("doc_id"), col("lbl").as("label"),
        col("votes"), col("n_labeled"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected graph given as ordered (a<b) edges — the standard
    * cohesion diagnostic for a near-dup pair graph: triangle-dense
    * neighborhoods are true duplicate clusters, triangle-free hubs are
    * LSH false-positive stars (a containment-style artifact worth
    * inspecting before transitive-closure dedup merges them).
    *
    * Dataflow is plan-time adaptive (the simhashAutoBits discipline):
    * past `orientThreshold` edges, the DEGREE-ORDERED-orientation wedge
    * join runs (the standard hub cure, exact — not an approximation):
    * every edge orients from its lower-(degree, id) endpoint to the
    * higher, wedges form only between a vertex's OUT-neighbors, and one
    * join against the oriented edges closes them. Each triangle is
    * built exactly once (at its lowest-ranked vertex), and the
    * per-vertex wedge term is out-degree², which orientation bounds at
    * O(√m) even for a boilerplate hub whose raw degree is corpus-sized.
    * Below the threshold the simple middle-vertex join (a<b<c wedges)
    * runs instead — orientation costs two extra edge⋈degree joins,
    * which a small hub-free graph never earns back (measured at sf0.1:
    * 1.6 s middle-vertex vs 3.0 s oriented). Both paths produce the
    * identical output, so the choice is pure physical planning.
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String,
      orientThreshold: Long = 2000000L): DataFrame = {
    // the edge set feeds the wedge joins, the closing join and the
    // degree aggregate — localCheckpoint materializes the (expensive
    // upstream: LSH banding) pair pipeline ONCE instead of re-deriving
    // it per reference (the q99 discipline)
    val e = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint(true)
    var deg = e.select(col("a").as("doc_id"))
      .union(e.select(col("b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val tris =
      if (e.count() <= orientThreshold) {
        // wedge a<b<c = edge (a,b) meeting edge (b,c) on the middle vertex
        val wedges = e.join(e.select(col("a").as("b"), col("b").as("c")), "b")
        wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
          .select(col("a").as("src"), col("b").as("v"), col("c").as("w"))
      } else {
        val degCp = deg.localCheckpoint(true)
        deg = degCp // the output join below must reuse the materialization
        // orient low-(degree, id) → high; carry the head's rank for
        // wedge ordering
        val withDeg = e
          .join(degCp.select(col("doc_id").as("a"), col("degree").as("da")), "a")
          .join(degCp.select(col("doc_id").as("b"), col("degree").as("db")), "b")
        val aFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val out = withDeg.select(
            when(aFirst, col("a")).otherwise(col("b")).as("src"),
            when(aFirst, col("b")).otherwise(col("a")).as("dst"),
            when(aFirst, col("db")).otherwise(col("da")).as("dd"))
          .localCheckpoint(true) // wedge join (×2) + closing join
        val wedges = out.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
          .join(out.select(col("src"), col("dst").as("w"), col("dd").as("dw")), "src")
          .filter(col("dv") < col("dw") ||
            (col("dv") === col("dw") && col("v") < col("w")))
        // rank(v) < rank(w), so a closing v—w edge is oriented v→w
        wedges
          .join(out.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
          .select(col("src"), col("v"), col("w"))
      }
    val perNode = tris
      .select(explode(array(col("src"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("doc_id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("clustering",
        when(col("degree") >= 2,
          round(lit(2.0) * col("n_tri") / (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("degree"), col("n_tri"), col("clustering"))
  }

  /** Adamic-Adar link prediction over the same pair graph: for every
    * non-adjacent vertex pair with at least one common neighbor, score
    * = sum over common neighbors z of 1/ln(deg(z)) — rare shared
    * neighbors count more. In the dedup pipeline this ranks MISSED
    * pairs: two docs sharing several low-degree LSH neighbors are
    * near-certain duplicates the banding happened to split.
    *
    * Candidate pairs exist only through a shared neighbor (one self-join
    * of the symmetric adjacency on the center vertex, u<v) — never
    * all-pairs; existing edges drop via one anti-join. Each 1/ln term is
    * cast to DECIMAL(18,12) before summing so the aggregate is
    * order-independent and oracle-exact under any partitioning.
    */
  def adamicAdar(pairs: DataFrame, aCol: String, bCol: String,
      maxDegree: Int = 64): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    // edge set feeds the neighborhood aggregate and the final anti-join;
    // materialize the (expensive upstream: LSH banding) pipeline once
    val e = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint(true)
    val adj = e.select(col("a").as("z"), col("b").as("nbr"))
      .union(e.select(col("b").as("z"), col("a").as("nbr")))
    // adj⋈adj on the center vertex would be deg² wedge rows — quadratic
    // on a boilerplate hub (an over-shared header's vertex touches half
    // the corpus). Standard link-prediction practice caps each CENTER's
    // neighbor list at maxDegree first: wedge volume is then bounded at
    // n·maxDegree² by construction. The kept k are a content-addressed
    // uniform sample (the house md5 order — deterministic, engine-
    // independent, no RNG), since this edge set is unweighted; with
    // weighted edges, rank by weight/recency instead. The 1/ln(deg)
    // score term still uses the TRUE degree, so kept terms are exact —
    // capping only subsamples which common neighbors are seen
    // (n_common is the capped count). Measured against the row-local
    // sorted-neighbor-list expansion (collect_list + nested transform):
    // the hash join wins ~2.7× at these degrees.
    val wCap = org.apache.spark.sql.expressions.Window.partitionBy(col("z"))
      .orderBy(Q.md5Bucket32(concat_ws(":", col("z"), col("nbr"))), col("nbr"))
    val adjCapped = adj.withColumn("__rn", row_number().over(wCap))
      .filter(col("__rn") <= maxDegree).drop("__rn")
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 12)
    // the 1/ln(dz) DECIMAL term is computed ONCE PER CENTER VERTEX here
    // (|V| rows) instead of once per wedge row (the wedge table is
    // maxDegree²/2 larger): the double division and — the expensive
    // part — the double→DECIMAL(18,12) conversion ride the deg join
    // into the wedge stage as a ready column, and the wedge aggregation
    // sums identical decimal addends in either formulation, so the
    // round-6 result is bit-equal (round-17 optimization, guide §1.2
    // "per-task work"; re-proven vs the oracle at sf0.001/0.01/0.1).
    // dz = 1 centers form no wedge (the u<v self-join needs two
    // neighbors), so the old per-wedge expression never divided by
    // ln(1) = 0; the per-z precompute must guard them out explicitly
    // (ANSI mode) — joined wedge rows always carry dz >= 2, so the
    // term is never null where it is consumed
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("dz"))
      .withColumn("__aa_term", when(col("dz") >= 2,
        (lit(1.0) / log(col("dz"))).cast(dec12)))
    val cand = adjCapped.select(col("z"), col("nbr").as("u"))
      .join(adjCapped.select(col("z"), col("nbr").as("v")), "z")
      .filter(col("u") < col("v"))
    // no broadcast hint on deg: it has one row per vertex, which AQE
    // may broadcast locally but must be allowed to shuffle at scale
    val scored = cand.join(deg, "z")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        round(sum(col("__aa_term")).cast("double"), 6).as("aa_score"))
    scored
      .join(e, scored("u") === e("a") && scored("v") === e("b"), "left_anti")
      .select(col("u").as("doc_a"), col("v").as("doc_b"),
        col("n_common"), col("aa_score"))
  }

  /** Bounded k-core peeling over the pair graph: `rounds` synchronous
    * iterations each drop every vertex whose CURRENT degree is below k,
    * then the edges touching it. The survivors after the last round are
    * the k-core once a round removes nothing; fixed rounds — not a
    * fixpoint loop — so the distributed plan and the unrolled SQL
    * oracle compute the IDENTICAL object by construction (the q99
    * unrolled-iteration discipline). In the dedup pipeline the dense
    * core is template/boilerplate spam: vertices surviving k=2+ peels
    * sit in near-dup blocks no pairwise threshold explains away.
    *
    * Scale: each round is one symmetric degree aggregation plus two
    * semi-joins on vertex id — all equi-shuffles keyed by vertex;
    * per-round localCheckpoint truncates the lineage exactly like the
    * q99 power iterations (without it round r replans rounds 1..r-1).
    */
  def kCore(pairs: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got $k/$rounds")
    var e = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("v"))
      e = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }
    e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .select(col("v").as("doc_id"), col("degree"))
  }

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, driverThreshold: Long = 100000): DataFrame = {
    // clamp BELOW Int.MaxValue: limit() takes an Int, and a larger
    // threshold would silently truncate the collected pair set while
    // still passing the size guard — wrong clusters, not a crash
    val thr = math.min(driverThreshold, (Int.MaxValue - 2).toLong)
    // null ids can't participate in either path (joins never match null;
    // the driver path would NPE) — drop them up front, consistently
    val e = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val firstPairs = if (thr > 0)
      e.limit(thr.toInt + 1).collect()
    else Array.empty[org.apache.spark.sql.Row]
    if (thr > 0 && firstPairs.length <= thr) {
      // union-find with path compression; cluster = min id per component
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = { // iterative — a long chain must not blow the stack
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      firstPairs.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (ra, rb) = (find(a), find(b))
        // union by MIN id, so every root is already its component's min
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val vertices = firstPairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      val spark = pairs.sparkSession
      import spark.implicits._
      return vertices.toSeq.map(v => (v, find(v))).toDF("vertex", "cluster")
    }
    // Distributed path: LARGE-STAR / SMALL-STAR contraction (Kiveris,
    // Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components
    // in MapReduce and Beyond", SoCC 2014). Unlike min-label propagation
    // (O(diameter) rounds — a chain graph needed diameter rounds and
    // threw at maxIter before round 8), the alternating star operations
    // contract every component onto its minimum vertex in O(log n)
    // rounds REGARDLESS of diameter:
    //   large-star(u): every neighbor v > u re-links to
    //                  m = min({u} ∪ Γ(u));
    //   small-star(u): over edges directed u > v, every smaller neighbor
    //                  (and u itself) links to m = min of them.
    // Each round is two keyed aggregations + equi-joins — plain vertex-
    // keyed shuffles, localCheckpoint truncating lineage per round. The
    // fixpoint is a star forest (every vertex edged to its component
    // min), so convergence = the edge set reproducing itself; maxIter is
    // only a safety bound (the paper proves O(log² n) worst-case, ~log n
    // observed; the 1M-vertex chain probe converges in well under 25).
    val verts = e.select(col("u").as("vertex"))
      .union(e.select(col("v").as("vertex"))).distinct().localCheckpoint(true)
    // round-18: the eager checkpoint's own forcing job IS a count —
    // surface it (GraftInternal.localCheckpointWithCount) instead of
    // paying a second count job per round over the just-cached RDD
    var (edges, edgeCount) = org.apache.spark.sql.GraftInternal
      .localCheckpointWithCount(e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct())
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // Round-17 shuffle audit (guide §2.4): each half-step feeds ONE
      // subtree into both a groupBy(u) and a join on u — an explicit
      // repartition(u) establishes that partitioning ONCE, and both
      // consumers (plus the SMJ's sorts) run exchange-free on top of it.
      // The old shape paid three exchanges of the same rows per
      // half-step: the aggregate's, the join probe side's, and (in
      // large-star) an intermediate distinct keyed by (u,v) that the
      // small-star ops could not reuse anyway. That distinct is dropped
      // outright — duplicate (v, m) rows change neither min() nor the
      // final distinct'd edge set, so the round's OUTPUT is identical
      // edge-for-edge (the convergence counts compare post-distinct
      // sets, unchanged).
      // large-star over the symmetric view
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val lgMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.join(lgMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // directed: u > v=m
        .filter(col("u") =!= col("v"))
        .repartition(col("u"))
      // small-star over the (u > v)-directed edges
      val smMin = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      // fixpoint test on the contracted (star-sized) edge set; the count
      // rides the checkpoint's materializing job (see round-18 note above)
      val (afterSmall, nextCount) = org.apache.spark.sql.GraftInternal
        .localCheckpointWithCount(afterLarge.join(smMin, "u")
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(smMin.select(col("u"), col("m").as("v")))
          .distinct())
      converged = nextCount == edgeCount && afterSmall.except(edges).isEmpty
      edges = afterSmall
      edgeCount = nextCount
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents star contraction did not converge in $maxIter " +
          "rounds — raise maxIter (paper bound is O(log^2 n))")
    // star forest: non-roots carry (u -> root v); roots and isolated
    // (self-loop-only) vertices label themselves
    val nonRoot = edges.select(col("u").as("vertex"), col("v").as("cluster"))
    val selfLabel = verts.join(nonRoot.select(col("vertex")), Seq("vertex"), "left_anti")
      .select(col("vertex"), col("vertex").as("cluster"))
    nonRoot.union(selfLabel)
  }

  /** Apply a dedup decision to the corpus: resolve candidate `pairs` into
    * clusters ([[connectedComponents]]) and drop every clustered document
    * except its cluster's canonical keeper (min id). Documents in no pair
    * pass through untouched. The drop-set (clustered non-keepers) is a
    * tiny fraction of the corpus, and the join is keyed on the id — a
    * broadcast anti-join whenever the cluster table fits, else a plain
    * hash anti-join; the corpus never shuffles more than once.
    */
  def dedupSurvivors(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val drops = connectedComponents(pairs, aCol, bCol)
      .filter(col("vertex") =!= col("cluster"))
      .select(col("vertex").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** Cluster dedup keeping the BEST document per duplicate cluster
    * instead of [[dedupSurvivors]]' canonical-min-id: real pipelines keep
    * the longest / highest-quality member (the min-id rule throws away
    * quality for determinism; this keeps both — ties break on doc id).
    * `score` is any expression over `docs`' columns. One extra join
    * (cluster membership × scores, keyed by doc id) and one per-cluster
    * rank window, partition-bounded by cluster size.
    */
  def dedupSurvivorsBest(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, score: Column): DataFrame = {
    val scored = docs.select(col(idCol).cast("long").as("__v"), score.as("__s"))
    val member = connectedComponents(pairs, aCol, bCol)
      .join(scored, col("vertex") === col("__v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("__s").desc, col("vertex"))
    val drops = member.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("vertex").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** Concat-and-chunk sequence packing: documents laid end-to-end in
    * `idCol` order, each assigned its global token start offset and the
    * fixed-budget training sequence (`seqLen` tokens) it starts in.
    *
    * The global running sum is NOT a single-partition window (the classic
    * `Window.orderBy` trap — one task owns the whole corpus): it is the
    * canonical two-pass distributed prefix sum. Pass 1 range-partitions
    * by id, sorts within partitions, and collects ONE row per partition
    * (its token total); the driver scan-sums those into per-partition
    * start offsets (a few KB at any scale). Pass 2 streams each
    * partition, adding its broadcast base offset — Spark reuses pass 1's
    * shuffle files, so the data moves once.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    // NOT persisted: both passes hang off this one RDD instance, so they
    // share one ShuffleDependency — the DAGScheduler skips the map stage on
    // pass 2 and reads pass 1's shuffle files; only the within-partition
    // sort re-runs. Alignment is deterministic: the range boundaries are
    // fixed when `.rdd` plans the query, and the sort key (doc_id) is
    // unique. A persist here would linger until driver GC (blocks
    // accumulating across a long sweep) for no data movement saved.
    val rdd = toks.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val totals = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single((i, it.foldLeft(0L)(_ + _._2)))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
    val packed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var off = bases.value(i)
      it.map { case (id, n) =>
        val start = off
        off += n
        (id, n, start, start / seqLen)
      }
    }
    spark.createDataFrame(packed)
      .toDF("doc_id", "n_tokens", "start_offset", "seq_id")
  }

  /** Gopher-style repetition quality signals per document: the fraction
    * of words that are repeats (1 - distinct/total) and the share of
    * bigrams taken by the single most frequent bigram. High values flag
    * boilerplate/spam for filtering. One explode + two aggregations —
    * shuffle keyed by (doc, bigram), skew-bounded by document length.
    */
  def repetitionQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val wordStats = ws.select(col("doc_id"),
      size(col("ws")).cast("long").as("n_words"),
      size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
    val bigrams = ws.select(col("doc_id"), size(col("ws")).as("nw"), explode(expr(
      "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
      .as("bg"))
    val topBg = bigrams.groupBy(col("doc_id"), col("nw"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("nw")).agg(max(col("c")).as("top_bg"))
    wordStats.join(topBg, "doc_id")
      .select(col("doc_id"), col("n_words"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(col("top_bg").cast("double") / (col("nw") - 1), 6)
          .as("top_bigram_frac"))
  }

  /** BM25 relevance of every document for a bag of query terms, over an
    * inverted-index dataflow: term filter BEFORE the explode-aggregation
    * (only query-term postings ever shuffle), document frequencies from
    * the postings, corpus stats (N, avgdl) as a broadcast single row.
    * Per-term scores are summed in FIXED term order via conditional
    * aggregates, so the float result is reproducible run-to-run and
    * engine-to-engine (a bare sum() over shuffled rows is not).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val ws = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
    val dl = ws.select(col("doc_id"), size(col("ws")).cast("double").as("dl"))
    val tf = ws.select(col("doc_id"), explode(col("ws")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).cast("double").as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val scored = tf.join(dfreq, "w").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("w") === t, col("s"))), lit(0.0)).as(s"s$i")
    }
    scored.groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        round(terms.indices.map(i => col(s"s$i")).reduce(_ + _), 4).as("bm25"))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the language-modeling alternative to [[bm25]]:
    * score(q,d) = Σ_w ln((tf_{w,d} + μ·p(w|C)) / (|d| + μ)). Unlike
    * BM25, EVERY document scores on every query term (absent terms
    * draw the collection-probability smoothing mass), which is what
    * makes the score a proper log-likelihood — so the doc×term grid is
    * generated row-locally from the tiny literal term list (never a
    * corpus×corpus product) and term frequencies LEFT-join onto it.
    * Query terms missing from the whole collection are dropped
    * uniformly (p(w|C) = 0 would be −∞ for every doc — rank-neutral).
    *
    * One tf aggregation + keyed joins; per-doc log sums in DECIMAL;
    * μ and the collection stats are exact-integer-derived, so the
    * double tree is engine-identical.
    */
  def lmRetrieval(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], mu: Double = 50.0, k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "lmRetrieval needs at least one query term")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val ws = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
    val dl = ws.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val toks = ws.select(col("doc_id"), explode(col("ws")).as("w"))
    val qtoks = toks.filter(col("w").isin(terms: _*))
    val cf = qtoks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val ctot = toks.agg(count(lit(1)).as("ctot"))
    val tf = qtoks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val grid = dl.select(col("doc_id"), col("dl"),
      explode(array(terms.map(lit): _*)).as("w"))
    grid
      .join(tf, Seq("doc_id", "w"), "left")
      .join(cf, Seq("w")) // inner: collection-absent terms drop uniformly
      .crossJoin(broadcast(ctot))
      .withColumn("lp",
        log((coalesce(col("tf"), lit(0L)).cast("double") +
            lit(mu) * (col("cf").cast("double") / col("ctot"))) /
          (col("dl") + lit(mu))))
      .groupBy(col("doc_id"))
      .agg(sum(col("lp").cast(dec)).as("s"))
      .select(col("doc_id"), round(col("s").cast("double"), 6).as("ql_score"))
      .orderBy(col("ql_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Statistical language-model quality score (the CCNet/KenLM-filter
    * shape): train a word-bigram model ON the corpus itself — P(w2|w1) =
    * c(w1,w2)/c(w1) — and score each document by its mean bigram
    * log-probability. Low scores flag unnatural token sequences
    * (boilerplate, shuffled text, spam) that repetition counters miss.
    * Pure dataflow: one explode, two count aggregations, one join of the
    * doc bigrams against the model keyed by bigram — the model rides the
    * same shuffle keys it was built on. Per-doc sums go through
    * DECIMAL(18,4) (order-independent exact addition), so the float
    * result is reproducible across partitionings and engines. The score
    * is the SUM of bigram log-probs (with n_bigrams alongside): the mean
    * is the consumer's one division away — dividing here lands exactly
    * on .00005 rounding boundaries (a 4-decimal sum over a small n),
    * where engines disagree on half-up vs half-even.
    */
  def lmQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val model = c12.join(c1, "w1")
      .withColumn("lp", round(log(col("c12").cast("double") / col("c1")), 4))
    bi.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(graft.Q.d(col("lp"))).cast("double").as("sum_logprob"))
  }

  /** Deterministic per-stratum sampling: a document survives when the
    * first hex byte of md5(id) falls under its stratum's threshold —
    * content-addressed, so the SAME sample reproduces on any cluster
    * size, any partitioning, any engine (no RNG state; the property
    * `sampleBy` can't give you). Threshold "40" keeps 64/256 = 25%.
    * Pure codegen filter — zero shuffle, scales with the scan.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, String], defaultThreshold: String): DataFrame = {
    val t = thresholds.foldLeft(lit(defaultThreshold)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(substring(md5(col(idCol).cast("string")), 1, 2) < t)
  }

  /** Cross-document span repetition (the ExactSubstr signal of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better"):
    * for every document, how many of its `n`-gram positions carry an
    * n-gram that ALSO appears in at least one other document — the
    * span-level complement of whole-document dedup (boilerplate headers,
    * license blocks, quoted passages repeat across otherwise-unique
    * docs). Dataflow: per-doc DISTINCT n-grams (row-local array_distinct)
    * → one aggregation marking n-grams spanning ≥2 docs (min≠max doc id
    * — never a count, so hot n-grams cost one min/max merge) → semi-join
    * the full position multiset against the repeated set. Position
    * totals are row-local.
    */
  def crossDocRepeats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val ws = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= n)
    val gram = wordGramExpr(n)
    val repeated = ws
      .select(col("doc_id"), explode(expr(s"array_distinct($gram)")).as("kg"))
      .groupBy(col("kg"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("kg"))
    val positions = ws.select(col("doc_id"),
      (size(col("ws")) - (n - 1)).cast("long").as("n_positions"),
      explode(expr(gram)).as("kg"))
    positions.join(repeated, Seq("kg"), "left_semi")
      .groupBy(col("doc_id"), col("n_positions"))
      .agg(count(lit(1)).as("n_repeated"))
      .select(col("doc_id"), col("n_positions"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_positions"), 6)
          .as("rep_frac"))
  }

  /** Repeated-span REMOVAL — the destructive half of ExactSubstr dedup
    * (Lee et al. §4.1: cut every substring that occurs ≥2 times in the
    * corpus, keep the rest of the document). [[crossDocRepeats]] only
    * measures the signal; this rewrites the text, the way production
    * pipelines apply it. A span here is any word `n`-gram whose
    * occurrence count over ALL positions (within- and cross-document)
    * is ≥ 2; every word position covered by a flagged n-gram start is
    * cut and the survivors are re-joined in order.
    *
    * Dataflow: row-local n-gram array with positions → one count
    * aggregation keyed by gram (hot grams cost one partial-agg merge) →
    * semi-join flags the starts → explode to covered positions,
    * de-duplicated, collected per doc (bounded by doc length) → one
    * row-local rebuild keeps uncovered words. The corpus text itself
    * never shuffles — only (gram, doc, pos) tuples do, exactly like the
    * q86 signal. The rebuild probe is array_contains per word
    * (O(words × covered) interpreted); covered ≤ words keeps it
    * quadratic-in-doc-length worst case, fine for document-scale rows —
    * swap in a sorted-merge codegen Expression if docs grow to books.
    */
  def spanCut(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    require(n >= 2, s"span n-gram size must be >= 2, got $n")
    val ws = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
    val gram = wordGramExprGuarded(n) // short docs must stay in the output
    val starts = ws
      .select(col("doc_id"), posexplode(expr(gram)).as(Seq("p0", "kg")))
      .select(col("doc_id"), (col("p0") + 1).as("s"), col("kg"))
    val repeated = starts.groupBy(col("kg"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select(col("kg"))
    val cov = starts.join(repeated, Seq("kg"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cov"))
    ws.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_cut"),
        expr("concat_ws(' ', filter(transform(ws, (w, i) -> " +
          "IF(cov IS NOT NULL AND array_contains(cov, i + 1), NULL, w)), " +
          "x -> x IS NOT NULL))").as("text_clean"))
  }

  /** Mixture sampling — build a training mix hitting a token budget with
    * per-source WEIGHTS (the data-mixing step behind Pile-style corpora):
    * source s gets a target of `budgetFrac × totalTokens × w_s / Σw`,
    * and keeps the deterministic fraction of its docs that meets it
    * (capped at 1 — a small high-weight source contributes all it has).
    * Selection is the md5-prefix cut: a doc survives when its first 4
    * hex digits (16 bits) fall under the source's computed cut, so the
    * sample is content-addressed and reproducible anywhere, like
    * [[stratifiedSample]] but with the thresholds DERIVED from corpus
    * stats instead of given. Dataflow: one per-source aggregation (tiny
    * — rows = #sources), a one-row total, both broadcast back onto the
    * scan as a filter — the corpus shuffles zero times.
    */
  def mixtureSample(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Double],
      defaultWeight: Double, budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, s"budgetFrac in (0,1], got $budgetFrac")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val toks = docs.withColumn("__nt", size(split(col(textCol), " ")).cast("long"))
    val perSource = toks.groupBy(col(sourceCol))
      .agg(sum(col("__nt")).as("__src_tok"))
      .withColumn("__w", w)
    val totals = perSource.agg(sum(col("__src_tok")).as("__tot_tok"),
      sum(col("__w")).as("__tot_w"))
    // keep fraction, quantized to 16 bits; cut rendered as a 4-hex-digit
    // lowercase string so the comparison is the same lexicographic test
    // in any engine ("g" sorts above every hex digit = keep everything)
    val cuts = perSource.crossJoin(broadcast(totals))
      .withColumn("__cut", floor(
        least(lit(1.0), lit(budgetFrac) * col("__tot_tok") * col("__w") /
          (col("__tot_w") * col("__src_tok"))) * 65536))
      .select(col(sourceCol),
        when(col("__cut") >= 65536, lit("g"))
          .otherwise(lpad(lower(hex(col("__cut"))), 4, "0")).as("__cut_hex"))
    toks.join(broadcast(cuts), sourceCol)
      .filter(substring(md5(col(idCol).cast("string")), 1, 4) < col("__cut_hex"))
      .select(col(idCol), col(sourceCol), col("__nt").as("n_tokens"))
  }

  /** Overlapping token-window chunking for retrieval/embedding corpora:
    * windows of `window` tokens every `stride` tokens (stride < window
    * overlaps). explode + slice — zero shuffle, scales with the scan.
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST((size(ws) - 1) / $stride AS INT)), " +
          s"i -> array_join(slice(ws, i * $stride + 1, $window), ' '))"))
        .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens",
        size(split(col("chunk_text"), " ")).cast("long"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * `n`-word shingle with a held-out benchmark set (the n-gram overlap
    * check run before pretraining so eval data never leaks into the
    * corpus). The benchmark side is tiny relative to the corpus, so its
    * shingle set BROADCASTS — the training side streams through a
    * broadcast hash join with no shuffle, which is the only shape that
    * survives a 100 TB corpus scan. Output: one row per contaminated
    * training doc with the overlap count and how many distinct benchmark
    * docs it collides with.
    */
  // per-doc shingle DEDUP is row-local (array_distinct inside the row,
  // not a (doc, shingle) distinct) — the side reaches its join with no
  // shuffle at all
  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
      n: Int, as: String) = df
    .select(col(idCol).as(as), split(col(textCol), " ").as("ws"))
    .filter(size(col("ws")) >= n)
    .select(col(as), explode(expr(s"array_distinct(${wordGramExpr(n)})"))
      .as("sh"))

  def decontaminate(training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame =
    shingleRows(training, idCol, textCol, n, "doc_id")
      .join(broadcast(shingleRows(benchmark, idCol, textCol, n, "bench_id")), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_benchmark_docs"))

  /** Bloom-prefiltered decontamination — IDENTICAL output to
    * [[decontaminate]], different physics. [[decontaminate]] broadcasts
    * the benchmark shingle set; at a real eval-suite scale (hundreds of
    * benchmarks × contamination n-grams) that set is tens of GB — too
    * big to broadcast, so the confirm join must shuffle BOTH sides,
    * including every shingle of the 100 TB corpus.
    *
    * This path: (1) aggregate the benchmark shingles into a bloom filter
    * (`bloom_agg` — map-side combinable, result is num_bits/8 bytes no
    * matter how many shingles went in); (2) collect that ONE sketch row
    * to the driver and embed it as a plan literal; (3) prefilter corpus
    * shingles with `bloom_might_contain` INSIDE the corpus scan stage —
    * no false negatives, so nothing true is lost; (4) exact confirm join
    * (AQE picks the strategy) discards the false positives. The shuffle
    * now carries only the ~hit-rate fraction of corpus shingles: the
    * semi-join volume is decided by the sketch, not the corpus.
    *
    * `numBits` sizes the sketch: ~10 bits/item ≈ 1% false positives —
    * the default 2^26 bits (8 MiB) covers ~6.7M benchmark shingles.
    */
  def decontaminateBloom(training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      numBits: Long = 1L << 26): DataFrame = {
    graft.functions.Shims.register(training.sparkSession)
    val train = shingleRows(training, idCol, textCol, n, "doc_id")
    val bench = shingleRows(benchmark, idCol, textCol, n, "bench_id")
    val bloom = bench
      .agg(expr(s"bloom_agg(sh, ${math.max(1L, numBits / 10)}L, ${numBits}L)"))
      .head.getAs[Array[Byte]](0)
    val pre =
      if (bloom == null) train.filter(lit(false)) // empty benchmark side
      else train.filter(call_function("bloom_might_contain", lit(bloom), col("sh")))
    pre.join(bench, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_benchmark_docs"))
  }

  /** Per-source (domain) cap: keep at most `cap` documents from each
    * source, chosen by a deterministic content-addressed rank (md5 of the
    * id) so the survivors reproduce on any cluster. The standard guard
    * against a single crawled domain dominating the corpus. One shuffle
    * keyed by source; a pathologically hot source bounds its partition at
    * that source's row count — cap first with a per-partition pre-rank if
    * one domain is a material fraction of the corpus.
    */
  def capPerSource(docs: DataFrame, idCol: String, sourceCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(substring(md5(col(idCol).cast("string")), 1, 8), col(idCol))
    docs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Corpus snapshot diff — the dataset-versioning operator: classify
    * every document across two corpus versions as added / removed /
    * changed (content fingerprint moved) / unchanged. Complements the
    * shard manifest (q103): the manifest says WHETHER two runs differ,
    * this says WHICH documents did. One full-outer join keyed by id;
    * fingerprints are md5 of the text, computed inside each side's scan.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence rides an explicit flag, NOT fingerprint nullity — a
    // present document with NULL text has a null fingerprint and must
    // still read as present (null-text docs classify by the null-safe
    // fingerprint compare below, matching the oracle's doc_id IS NULL)
    val o = oldDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("__old_fp"), lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("__new_fp"), lit(true).as("__in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__old_fp") <=> col("__new_fp")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** SCD-type-2 merge of a new corpus snapshot into a versioned history
    * table — [[snapshotDiff]] tells you WHAT changed; this maintains the
    * standard warehouse answer to WHEN: every document version is a row
    * with (version, valid_from, valid_to, is_current), closed rows are
    * immutable history, and merging batch B closes changed/removed
    * documents at B and opens new versions from B.
    *
    * `current` carries (idCol, fpCol, version, valid_from, valid_to,
    * is_current); `snapshot` carries (idCol, fpCol). Closed history
    * passes through untouched (at 100 TB it is append-only parquet that
    * never shuffles); only the OPEN slice full-outer-joins the snapshot
    * on the id — one co-partitioned join of two id-keyed tables, then a
    * row-local case explode emits 1 or 2 rows per document. Batch
    * numbers, not wall-clock timestamps, keep the result deterministic.
    */
  def scd2Merge(current: DataFrame, snapshot: DataFrame, idCol: String,
      fpCol: String, batch: Long): DataFrame = {
    val outCols = Seq(col("doc_id").as(idCol), col("r.fp").as(fpCol),
      col("r.version"), col("r.valid_from"), col("r.valid_to"),
      col("r.is_current"))
    val closedHist = current.filter(!col("is_current"))
      .select(col(idCol), col(fpCol), col("version"), col("valid_from"),
        col("valid_to"), col("is_current"))
    val open = current.filter(col("is_current"))
      .select(col(idCol).as("doc_id"), col(fpCol).as("ofp"),
        col("version").cast("long").as("over"),
        col("valid_from").cast("long").as("ofrom"))
    // highest version ever assigned per doc, CLOSED rows included — a
    // removed document that reappears must continue its version
    // sequence, not restart at 1 and duplicate the (id, version) key.
    // One id-keyed max over the history; co-partitioned (or bucketed)
    // storage makes it shuffle-free alongside the id join below.
    val lastVer = current.groupBy(col(idCol).as("doc_id"))
      .agg(max(col("version").cast("long")).as("prev_ver"))
    val snap = snapshot.select(col(idCol).as("doc_id"), col(fpCol).as("nfp"))
    val b = lit(batch)
    val nl = lit(null).cast("long")
    val cases = open.join(snap, Seq("doc_id"), "full_outer")
      .join(lastVer, Seq("doc_id"), "left")
      .select(col("doc_id"), explode(
        when(col("ofp").isNull, // not open: brand new OR reappearing
          array(struct(col("nfp").as("fp"),
            (coalesce(col("prev_ver"), lit(0L)) + 1L).as("version"),
            b.as("valid_from"), nl.as("valid_to"), lit(true).as("is_current"))))
        .when(col("nfp").isNull, // gone → close at B
          array(struct(col("ofp").as("fp"), col("over").as("version"),
            col("ofrom").as("valid_from"), b.as("valid_to"),
            lit(false).as("is_current"))))
        .when(col("ofp") === col("nfp"), // unchanged → carry the open row
          array(struct(col("ofp").as("fp"), col("over").as("version"),
            col("ofrom").as("valid_from"), nl.as("valid_to"),
            lit(true).as("is_current"))))
        .otherwise( // changed → close old AND open version+1
          array(
            struct(col("ofp").as("fp"), col("over").as("version"),
              col("ofrom").as("valid_from"), b.as("valid_to"),
              lit(false).as("is_current")),
            struct(col("nfp").as("fp"), (col("over") + 1L).as("version"),
              b.as("valid_from"), nl.as("valid_to"),
              lit(true).as("is_current"))))).as("r"))
      .select(outCols: _*)
    closedHist.unionByName(cases)
  }

  /** Deterministic global corpus shuffle — the reproducible training
    * order: rank every document by a content-addressed key
    * md5("seed:doc_id") and assign contiguous global positions
    * 0..n-1. Any run, any cluster, any partitioning produces the SAME
    * permutation (the key is pure content), and changing the seed
    * reshuffles — which is how epoch ordering is derived without a
    * stateful RNG.
    *
    * No single-partition window: a range-repartition on the key orders
    * partitions globally, in-partition sorts order rows locally, and a
    * per-partition count + prefix-sum broadcast (the [[packSequences]]
    * two-pass shape — the tiny per-partition totals are the only driver
    * data) turns local offsets into global positions.
    */
  /** Novelty-decay audit over the epoch reading order — for every
    * document, the fraction of its distinct shingles whose FIRST
    * occurrence under the content-addressed epoch order
    * ([[deterministicShuffle]]'s md5 key) falls in this document.
    * Plotted against position this is the diversity-decay curve:
    * where it flattens, later data is mostly re-reading — the signal
    * duplication-aware curricula and train-another-epoch calls read.
    *
    * Order compares by the md5 key ITSELF, so no global position pass
    * runs: one row-local shingle explode, one gram-keyed min
    * aggregation, one gram join back, one per-doc count — the gram
    * table bounds everything.
    */
  def noveltyCurve(docs: DataFrame, idCol: String, textCol: String,
      seed: Long): DataFrame = {
    val keyed = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))"))
        .as("sh"))
      .withColumn("k", md5(concat_ws(":", lit(seed), col("doc_id"))))
    val first = keyed.groupBy(col("sh")).agg(min(col("k")).as("kmin"))
    keyed.join(first, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("k") === col("kmin"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  def deterministicShuffle(docs: DataFrame, idCol: String,
      seed: Long): DataFrame = {
    val spark = docs.sparkSession
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"))
      // null ids can't take a position (same explicit-drop contract as
      // connectedComponents); without this the rdd map would NPE
      .filter(col("doc_id").isNotNull)
      .withColumn("__k", md5(concat_ws(":", lit(seed), col("doc_id"))))
      .repartitionByRange(col("__k"), col("doc_id"))
      .sortWithinPartitions(col("__k"), col("doc_id"))
    val rdd = keyed.select("doc_id").rdd.map(_.getLong(0))
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator.single((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val bases = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val pos = rdd.mapPartitionsWithIndex { case (i, it) =>
      var p = bases.value(i)
      it.map { id => val r = (id, p); p += 1; r }
    }
    spark.createDataFrame(pos).toDF("doc_id", "pos")
  }

  /** Content-addressed train/val/test split assignment: a document's
    * split is a pure function of its id hash, so the assignment is
    * reproducible on any cluster, stable under corpus growth (new docs
    * never move old ones between splits), and needs no RNG state.
    * `bands` are (name, cumulativeFraction) with the last fraction 1.0;
    * fractions quantize to /65536 hash bands (first 4 md5 hex chars) so
    * the comparison is integer-exact in any engine. Zero shuffle — the
    * split column is a codegen row op.
    *
    * Leakage guard: hash the DOMAIN instead of the doc id
    * (`assignSplits(docs, "source", ...)`) and every document of a
    * source lands in the same split — near-duplicates within a domain
    * can never straddle the train/heldout boundary (spec'd).
    */
  def assignSplits(docs: DataFrame, idCol: String,
      bands: Seq[(String, Double)]): DataFrame = {
    require(bands.nonEmpty && math.abs(bands.last._2 - 1.0) < 1e-9,
      s"last cumulative fraction must be 1.0: $bands")
    require(bands.map(_._2) == bands.map(_._2).sorted,
      s"cumulative fractions must be nondecreasing: $bands")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int")
    val split = bands.init.foldRight(lit(bands.last._1): Column) {
      case ((name, f), rest) =>
        when(u < math.floor(f * 65536).toInt, name).otherwise(rest)
    }
    docs.withColumn("split", split)
  }

  /** Leakage-free split assignment: near-duplicate documents must land
    * in the SAME split (a near-dup pair straddling train/test is
    * contamination the doc-level hash of [[assignSplits]] cannot
    * prevent), so the content-addressed split hash keys on the near-dup
    * CLUSTER root instead of the document id. Cluster roots come from
    * [[connectedComponents]] over the pair graph (forced down the
    * distributed min-label path — the 100 TB route); documents in no
    * pair are their own singleton root via one left join. The split
    * expression is exactly q110's md5 band hash applied to the root, so
    * split FRACTIONS stay correct at the cluster level and membership
    * is stable under corpus growth.
    */
  def clusterAwareSplits(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, bands: Seq[(String, Double)]): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol, driverThreshold = 0L)
      .select(col("vertex").as(idCol), col("cluster"))
    val rooted = docs.join(cc, Seq(idCol), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster"), col(idCol).cast("long")))
      .drop("cluster")
    assignSplits(rooted, "cluster_id", bands)
  }

  /** Corpus-relative quantile-band filter — keep documents whose score
    * falls inside a per-group quantile band (e.g. drop the shortest 10%
    * and longest 10% of each language), the CCNet/RefinedWeb-style
    * "threshold relative to the corpus, not absolute" filtering step.
    *
    * Two physical shapes, same semantics:
    *   - `exact = true`: percent_rank window per group — one shuffle on
    *     the group key plus a per-group sort. Bit-reproducible (rank
    *     ratios are exact small-integer divisions), which is what the
    *     DuckDB oracle can diff; but at 100 TB a skewed group (English
    *     is half the web) funnels half the corpus through one sort
    *     partition.
    *   - `exact = false` (default — the scale path): per-group lo/hi
    *     thresholds via the approx-percentile sketch (map-side
    *     combinable, one tiny row per group), broadcast back, filter.
    *     No global sort, no skew funnel; band-edge error bounded by
    *     `accuracy` (1/accuracy relative rank error).
    *
    * Output: input rows that survive, plus the score as `__score`.
    */
  def quantileBandFilter(docs: DataFrame, groupCol: String, score: Column,
      lo: Double, hi: Double, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"bad quantile band [$lo, $hi]")
    val scored = docs.withColumn("__score", score)
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("__score"))
      scored.withColumn("__pr", percent_rank().over(w))
        .filter(col("__pr") >= lo && col("__pr") <= hi)
        .drop("__pr")
    } else {
      val thr = scored.groupBy(col(groupCol).as("__g"))
        .agg(percentile_approx(col("__score"),
          array(lit(lo), lit(hi)), lit(accuracy)).as("__t"))
      // null-SAFE group match: a null group is a group too in the exact
      // path's window, so the threshold join must not drop its rows
      scored.join(broadcast(thr), col(groupCol) <=> col("__g"))
        .filter(col("__score") >= element_at(col("__t"), 1) &&
          col("__score") <= element_at(col("__t"), 2))
        .drop("__g", "__t")
    }
  }

  /** CCNet-style PARAGRAPH-level dedup — the within-document complement
    * to the document-level dedup family: split every document into
    * paragraphs, count each distinct paragraph's document frequency
    * across the corpus, and REWRITE documents with the over-shared
    * paragraphs removed (boilerplate headers/footers/navigation — the
    * content that survives document-level near-dup because the
    * documents around it differ). Paragraphs shorter than `minLen`
    * characters are exempt (short strings collide by chance, not by
    * boilerplate).
    *
    * Scale shape: paragraphs explode row-locally with positions; the
    * doc-frequency table aggregates md5 hashes (map-side combinable,
    * one tiny row per distinct paragraph — never broadcast, it is
    * corpus-scale); the dup marks join back by hash (plain equi-join
    * shuffle, hot paragraphs bounded by the per-doc `.distinct`); the
    * rewrite is one groupBy(doc) re-assembly in paragraph order. Three
    * shuffles total, all keyed, no window over the corpus.
    *
    * Returns (doc_id, clean_text, n_kept, n_dropped).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n", maxDocFreq: Long = 1L, minLen: Int = 10): DataFrame = {
    val paras = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
    val freq = paras
      .filter(length(col("para")) >= minLen)
      .select(col("doc_id"), md5(col("para")).as("h"))
      .distinct() // a paragraph repeated WITHIN one doc counts one doc
      .groupBy(col("h")).agg(count(lit(1)).as("docfreq"))
    val marked = paras
      .join(freq, md5(col("para")) === col("h"), "left")
    val isDup = col("docfreq").isNotNull &&
      col("docfreq") > maxDocFreq && length(col("para")) >= minLen
    marked.groupBy(col("doc_id"))
      .agg(
        concat_ws(sep, transform(
          sort_array(collect_list(when(!isDup, struct(col("pos"), col("para"))))),
          s => s.getField("para"))).as("clean_text"),
        sum(when(!isDup, 1L).otherwise(0L)).as("n_kept"),
        sum(when(isDup, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Per-sequence document-boundary map — the attention-masking metadata
    * a trainer needs next to [[packSequences]] output: for every training
    * sequence, which documents occupy which token spans, so attention
    * can be blocked from crossing document boundaries inside a packed
    * sequence. One row per (sequence, document) overlap.
    *
    * Pure dataflow off the packing columns: a document spanning
    * sequences floor(start/L)..floor((start+n-1)/L) explodes into one
    * row per touched sequence (bounded by ceil(n_tokens/L) + 1, so skew
    * is bounded by the longest document), and the span inside each
    * sequence is clamp arithmetic — no joins, one final sort.
    */
  def sequenceBoundaries(packed: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    packed
      .withColumn("seq_id", explode(expr(
        s"sequence(start_offset div $seqLen, (start_offset + n_tokens - 1) div $seqLen)")))
      .select(col("seq_id"), col("doc_id"),
        greatest(col("start_offset") - col("seq_id") * seqLen, lit(0L))
          .as("start_in_seq"),
        least(col("start_offset") + col("n_tokens") - col("seq_id") * seqLen,
          lit(seqLen)).as("end_in_seq"))
  }

  /** Materialize packed training shards: pack the corpus into `seqLen`
    * sequences, group `seqsPerShard` consecutive sequences into a shard,
    * and write parquet partitioned by `shard_id` — the physical layout a
    * trainer streams: one directory per shard, rows ordered by their
    * global token offset inside each file. `repartition(shard_id)` +
    * `sortWithinPartitions` means every shard is written by exactly one
    * task as one sorted file — no post-hoc compaction; shard count scales
    * the write parallelism.
    */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long, seqsPerShard: Long, path: String): Unit = {
    val packed = packSequences(docs, idCol, textCol, seqLen)
      .withColumn("shard_id", expr(s"seq_id div $seqsPerShard"))
    packed
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("start_offset"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
  }

  /** PageRank over a link graph — the classic URL/domain quality signal
    * web-corpus pipelines (CCNet/RefinedWeb lineage) use to weight or
    * filter crawled documents. Power iteration with damping and uniform
    * dangling-mass redistribution; every round is one join keyed by the
    * edge source plus one aggregation keyed by the destination — plain
    * shuffles that scale with executors, lineage-truncated per round
    * like [[connectedComponents]]. The dangling sum is a one-row frame
    * (cross-joined broadcast, never a driver collect on the data path).
    *
    * Engine-exact reproducibility (the [[graft.Q]] conventions): each
    * per-edge contribution casts to DECIMAL(28,12) before the in-degree
    * sum (order-independent addition), each iteration's rank rounds to
    * 12 places, and literals/operation order match the unrolled oracle
    * text exactly.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    // round-17 (guide §2.4, §1.2): materialize the node list ONCE — the
    // old loop re-derived `nodes.select(node)` from the parquet scan in
    // every iteration's rank join (iters extra corpus scans); and
    // precompute the STATIC dangling-node set (no outgoing edges) so the
    // per-iteration dangling-mass term is a semi-join of the rank frame
    // against a small fixed table instead of re-joining rank×outdeg —
    // the old shape computed that join twice per iteration (once under
    // the dangsum broadcast, once inside contribs). Same rows reach the
    // same DECIMAL sums; oracle parity unchanged (re-proven vs DuckDB).
    val nodesOnly = nodes.select(col("node")).localCheckpoint(true)
    val nd = nodesOnly.count().toDouble
    val dangling = nodesOnly
      .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint(true)
    var pr = nodesOnly.select(col("node"), lit(1.0 / nd).as("rank"))
      .localCheckpoint(true)
    val base = (1.0 - damping) / nd
    var i = 0
    while (i < iters) {
      val dang = pr.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec)).as("dangsum"))
      val contribs = pr.join(e, pr("node") === e("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).cast(dec).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      pr = nodesOnly
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          round(lit(base) + lit(damping) *
            (coalesce(col("contrib").cast("double"), lit(0.0)) +
              col("dangsum").cast("double") / lit(nd)), 12).as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    pr
  }

  /** Newman modularity of a clustering over an undirected pair graph —
    * the quality score that tells a dedup/community pipeline whether
    * its clusters are real structure or noise: Q = Σ_c [e_c/m −
    * (d_c/2m)²] compares each cluster's internal edge fraction against
    * the degree-preserving random expectation (Q ≈ 0 ⇒ the "clusters"
    * are what chance produces; the per-cluster contributions localize
    * which ones). Runs on [[connectedComponents]] labels here (where
    * CC clusters score near-maximal by construction — the audit shape;
    * swap in q164 label-prop or any labeling).
    *
    * Dataflow: degree aggregation + two label joins keyed by vertex,
    * then cluster-keyed sums — all plain shuffles; every term an
    * integer ratio, the total a DECIMAL sum over the cluster table.
    */
  def modularity(pairs: DataFrame, aCol: String, bCol: String,
      labels: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val mdf = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val lab = labels.select(col("doc_id").as("node"), col("cluster_id"))
    val dPer = deg.join(lab, "node")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("degree")).as("d_c"))
    val ePer = e
      .join(lab.select(col("node").as("u"), col("cluster_id").as("ca")), "u")
      .join(lab.select(col("node").as("v"), col("cluster_id").as("cb")), "v")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("cluster_id")).agg(count(lit(1)).as("e_c"))
    val per = dPer.join(ePer, Seq("cluster_id"), "left")
      .crossJoin(broadcast(mdf))
      .select(col("cluster_id"), col("n_nodes"),
        coalesce(col("e_c"), lit(0L)).as("e_intra"), col("d_c"),
        (coalesce(col("e_c"), lit(0L)).cast("double") / col("m") -
          pow(col("d_c").cast("double") / (lit(2L) * col("m")), 2))
          .as("contrib"))
    val total = per.agg(sum(col("contrib").cast(dec)).as("q_d"))
    per.crossJoin(broadcast(total))
      .select(col("cluster_id"), col("n_nodes"), col("e_intra"), col("d_c"),
        round(col("contrib"), 6).as("contrib"),
        round(col("q_d").cast("double"), 6).as("modularity"))
  }

  /** Group-integral k-fold assignment (GroupKFold) — the split that
    * PREVENTS what q153's leakage audit detects: all members of a
    * duplicate cluster land in the same fold (near-dups straddling a
    * train/eval boundary leak the answer). Fold = content-addressed
    * hash of the group's canonical id ([[graft.Q.md5Bucket32]] — the
    * [[stratifiedSample]] convention: same assignment on any cluster
    * size, any engine, any partitioning); singletons group as
    * themselves. One label join + a row-local hash, no shuffles beyond
    * the clustering it consumes.
    */
  def groupKFold(docs: DataFrame, idCol: String, groupLabels: DataFrame,
      k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    docs.select(col(idCol).as("doc_id"))
      .join(groupLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
      .withColumn("fold",
        Q.md5Bucket32(concat(lit("fold:"),
          col("group_id").cast("string"))) % k)
  }

  /** Adjusted Rand Index between two labelings of the same units —
    * THE chance-corrected agreement score for clusterings (label
    * permutations don't matter, unlike accuracy): pair-counting over
    * the contingency table, ARI = (Σij C(nij,2) − E) / (max − E) with
    * E = Σi C(ai,2)·Σj C(bj,2) / C(n,2). Here it grades a dedup
    * clustering against a reference labeling — "do my near-dup
    * clusters line up with the known grouping" — the companion to
    * [[modularity]]'s intrinsic quality. Every term is exact integer
    * combinatorics; the single final division is the only float step
    * (the [[graft.operators.Eval.rocAuc]] discipline).
    *
    * One contingency aggregation (rows = |A-clusters × B-labels|
    * observed, bounded by the label products) + two marginal sums.
    */
  def adjustedRand(labeled: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // DOUBLED pair counts t(x) = x(x−1) throughout — the /2s cancel in
    // the ARI ratio (ARI = (2·N₂·S_ij − 2·S_a·S_b) /
    // (N₂·(S_a+S_b) − 2·S_a·S_b) with every S already doubled), so no
    // integer division anywhere; DECIMAL(38,0) keeps the n² products
    // exact past BIGINT (n ~ 3e9 units overflows x(x−1) in 64 bits)
    def t(c: Column) = { val d = c.cast(dec0); d * (d - lit(1L)) }
    val cont = labeled.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("nij"))
    val sumIj = cont.agg(sum(t(col("nij"))).as("sij"), sum(col("nij")).as("n"))
    val sumA = cont.groupBy(col("a")).agg(sum(col("nij")).as("ai"))
      .agg(sum(t(col("ai"))).as("sa"))
    val sumB = cont.groupBy(col("b")).agg(sum(col("nij")).as("bj"))
      .agg(sum(t(col("bj"))).as("sb"))
    // n and ari only: the doubled-pair sums live in DECIMAL(38,0)
    // precisely because they overflow BIGINT at the n ~ 3e9 scale this
    // operator targets, so they must not be down-cast for display
    sumIj.crossJoin(broadcast(sumA)).crossJoin(broadcast(sumB))
      .select(col("n"),
        round((lit(2L) * t(col("n")) * col("sij") -
            lit(2L) * col("sa") * col("sb")).cast("double") /
          (t(col("n")) * (col("sa") + col("sb")) -
            lit(2L) * col("sa") * col("sb")).cast("double"), 6).as("ari"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a link graph — the
    * companion signal to [[pageRank]]: authority separates
    * heavily-cited reference pages from the index/portal pages that
    * cite them (hubs), where PageRank conflates both into one score.
    * Power iteration with L1 normalization each half-step:
    * a(v) = Σ_{u→v} h(u) then a /= Σa; h(u) = Σ_{u→v} a(v) then
    * h /= Σh. Each half-step is one equi-join keyed by an edge
    * endpoint plus one aggregation — the same plain-shuffle shape and
    * per-round `localCheckpoint` lineage discipline as [[pageRank]];
    * the normalizer is a 1-row broadcast, never a driver collect.
    *
    * Engine-exact: per-edge contributions cast DECIMAL(28,12) before
    * summing (order-independent), scores round to 12 places after each
    * normalize, operation order mirrors [[hitsOracle]] text exactly.
    */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    // iters = 0 would leave the authority frame unassigned (the `var a`
    // placeholder below) and fail at analysis with a missing-column
    // error far from the cause — fail fast here instead
    require(iters >= 1, s"hits needs iters >= 1, got $iters")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)
    val nd = nodes.count().toDouble
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodesOnly = nodes.select(col("node")).localCheckpoint(true)
    // Round-18 (guide §1.2, fewer jobs per iteration): the half-step no
    // longer re-attaches the FULL node list each round. A node absent
    // from `raw` scores round(0/ts, 12) = 0.0 and contributes only
    // exact-zero DECIMAL addends (cast(0.0 as dec(28,12))) to the next
    // round's sums and normalizer — decimal addition with zero is the
    // identity, so iterating on the ACTIVE rows alone is value-identical
    // (oracle-verified). The all-nodes left join + its broadcast build
    // ran 16× per query and is now ONE final join that restores the
    // zero rows. The normalizer stays the 1-row broadcast: `raw` feeds
    // both it and the projection through the SAME reused Exchange
    // (round-17 audit: checkpointing `raw` — eager or lazy — measured
    // SLOWER because the RDD boundary costs the reuse and all stats).
    def halfStep(scores: DataFrame, scoreCol: String, joinOn: String,
        emitAs: String, outCol: String): DataFrame = {
      val raw = scores.join(e, scores("node") === e(joinOn))
        .select(col(emitAs).as("node"), col(scoreCol).cast(dec).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      // Normalizer stays the 1-row broadcast — MEASURED-AND-REJECTED
      // (round-18): an empty-partition window normalizer inside the
      // half-step job (same exact decimal sum, one job fewer per
      // half-step) won at sf0.1 (ProbeQ interleaved min 3.2/3.8 vs
      // 4.5/4.5 s) but LOST at sf1 (7.9/8.7 vs 5.8/5.9 s) — the
      // single-partition window funnels every row of every half-step
      // through ONE task, serializing exactly where scale needs width.
      val tot = raw.agg(sum(col("s")).cast("double").as("ts"))
      raw
        .crossJoin(broadcast(tot))
        .select(col("node"),
          round(col("s").cast("double") / col("ts"), 12).as(outCol))
        .localCheckpoint(true)
    }
    var h = nodesOnly.select(col("node"), lit(1.0 / nd).as("h"))
      .localCheckpoint(true)
    var a = h // placeholder; always assigned before use when iters >= 1
    var i = 0
    while (i < iters) {
      a = halfStep(h, "h", "src", "dst", "a")
      h = halfStep(a, "a", "dst", "src", "h")
      i += 1
    }
    // restore the zero-score nodes the iteration never needed to carry
    nodesOnly
      .join(a, Seq("node"), "left")
      .join(h, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("a"), lit(0.0)).as("authority"),
        coalesce(col("h"), lit(0.0)).as("hub"))
  }

  /** Unrolled oracle text for [[hits]] over [[docLinkGraph]] — the
    * [[pageRankOracle]] conventions: every stage MATERIALIZED (each is
    * referenced by both the next half-step and its own normalizer),
    * numeric literals CAST AS DOUBLE, per-edge DECIMAL(28,12) sums,
    * round-12 after each normalize. */
  private[operators] def hitsOracle(iters: Int): String = {
    val stages = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS node, SUM(CAST(p.h AS DECIMAL(28,12))) AS s
         |  FROM h${i - 1} p JOIN edges e ON e.src = p.node GROUP BY e.dst),
         |at$i AS (SELECT CAST(SUM(s) AS DOUBLE) AS ts FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT n2.node,
         |    round(COALESCE(CAST(r.s AS DOUBLE), CAST(0.0 AS DOUBLE)) / t.ts,
         |      12) AS a
         |  FROM nodes n2 LEFT JOIN ar$i r ON r.node = n2.node
         |  CROSS JOIN at$i t),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS node, SUM(CAST(p.a AS DECIMAL(28,12))) AS s
         |  FROM a$i p JOIN edges e ON e.dst = p.node GROUP BY e.src),
         |ht$i AS (SELECT CAST(SUM(s) AS DOUBLE) AS ts FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT n2.node,
         |    round(COALESCE(CAST(r.s AS DOUBLE), CAST(0.0 AS DOUBLE)) / t.ts,
         |      12) AS h
         |  FROM nodes n2 LEFT JOIN hr$i r ON r.node = n2.node
         |  CROSS JOIN ht$i t)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd, count(*) AS ni
       |       FROM documents),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT doc_id AS src, unnest([
       |      (doc_id * 7 + 1) % nn.ni,
       |      (doc_id * 13 + 2) % nn.ni,
       |      (doc_id * 31 + 5) % nn.ni]) AS dst
       |    FROM documents CROSS JOIN nn) t
       |  WHERE dst <> src
       |),
       |h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / nn.nd AS h
       |        FROM nodes CROSS JOIN nn),
       |$stages
       |SELECT a$iters.node AS doc_id, a$iters.a AS authority,
       |  h$iters.h AS hub
       |FROM a$iters JOIN h$iters ON a$iters.node = h$iters.node
       |ORDER BY doc_id""".stripMargin
  }

  /** The synthetic deterministic link graph q99 ranks: every document
    * links to three arithmetic targets mod N (self-links and duplicate
    * targets removed) — the same construction the oracle text uses. */
  def docLinkGraph(docs: DataFrame, idCol: String): DataFrame = {
    val n = docs.count()
    docs.select(col(idCol).as("src"),
        explode(array(
          expr(s"($idCol * 7 + 1) % $n"),
          expr(s"($idCol * 13 + 2) % $n"),
          expr(s"($idCol * 31 + 5) % $n"))).as("dst"))
      .filter(col("dst") =!= col("src"))
      .distinct()
  }

  /** Unrolled oracle text for [[pageRank]] over [[docLinkGraph]] —
    * `iters` chained CTE stages with the same decimal casts, rounding,
    * and literal arithmetic. All numeric literals are CAST AS DOUBLE so
    * DuckDB does IEEE double math (its bare decimals would otherwise do
    * exact decimal arithmetic and diverge). Every stage is MATERIALIZED:
    * each references its predecessor twice (contributions + dangling
    * mass), and DuckDB's default CTE inlining would blow the plan up
    * 2^iters. */
  private[operators] def pageRankOracle(iters: Int, damping: Double): String = {
    val stages = (1 to iters).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT n2.node,
         |    round((CAST(1.0 AS DOUBLE) - CAST($damping AS DOUBLE)) / nn.nd
         |      + CAST($damping AS DOUBLE) * (
         |        COALESCE(CAST(c.contrib AS DOUBLE), CAST(0.0 AS DOUBLE))
         |        + CAST(d.dangsum AS DOUBLE) / nn.nd), 12) AS rank
         |  FROM nodes n2
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      SUM(CAST(p.rank / o.outdeg AS DECIMAL(28,12))) AS contrib
         |    FROM pr${i - 1} p
         |    JOIN edges e ON e.src = p.node
         |    JOIN outdeg o ON o.src = p.node
         |    GROUP BY e.dst) c ON c.node = n2.node
         |  CROSS JOIN (
         |    SELECT COALESCE(SUM(CAST(p.rank AS DECIMAL(28,12))),
         |                    CAST(0 AS DECIMAL(28,12))) AS dangsum
         |    FROM pr${i - 1} p
         |    LEFT JOIN outdeg o ON o.src = p.node
         |    WHERE o.src IS NULL) d
         |  CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd, count(*) AS ni
       |       FROM documents),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT doc_id AS src, unnest([
       |      (doc_id * 7 + 1) % nn.ni,
       |      (doc_id * 13 + 2) % nn.ni,
       |      (doc_id * 31 + 5) % nn.ni]) AS dst
       |    FROM documents CROSS JOIN nn) t
       |  WHERE dst <> src
       |),
       |outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / nn.nd AS rank
       |        FROM nodes CROSS JOIN nn),
       |$stages
       |SELECT node AS doc_id, rank FROM pr$iters ORDER BY doc_id""".stripMargin
  }

  /** Fill-in-the-middle splits (Bavarian et al. 2022) — the augmentation
    * code/text pretraining pipelines apply so models learn infilling:
    * each document cuts at two CONTENT-ADDRESSED points (md5-derived,
    * the [[stratifiedSample]] convention — same split on any cluster
    * size or engine) into (prefix, middle, suffix), re-emitted in PSM or
    * SPM sentinel order by hash parity (the standard 50/50 mode mix).
    * Pure codegen row ops — zero shuffle, scales with the scan.
    */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
      .withColumn("h1",
        expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % len"))
      .withColumn("h2",
        expr("CAST(conv(substring(md5(concat(t, '#2')), 1, 8), 16, 10) AS BIGINT) % len"))
      .withColumn("lo", least(col("h1"), col("h2")))
      .withColumn("hi", greatest(col("h1"), col("h2")))
      .select(col("doc_id"), col("h1"),
        expr("substring(t, 1, CAST(lo AS INT))").as("prefix"),
        expr("substring(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))").as("middle"),
        expr("substring(t, CAST(hi + 1 AS INT), CAST(len - hi AS INT))").as("suffix"))
      .select(col("doc_id"),
        length(col("prefix")).cast("long").as("n_prefix"),
        length(col("middle")).cast("long").as("n_middle"),
        length(col("suffix")).cast("long").as("n_suffix"),
        when(col("h1") % 2 === 0,
          concat(lit("<PRE>"), col("prefix"), lit("<SUF>"), col("suffix"),
            lit("<MID>"), col("middle")))
          .otherwise(concat(lit("<SUF>"), col("suffix"), lit("<PRE>"), col("prefix"),
            lit("<MID>"), col("middle"))).as("fim"),
        when(col("h1") % 2 === 0, lit("psm")).otherwise(lit("spm")).as("mode"))

  /** The full Gopher rule table (Rae et al. 2021, appendix A1 — the
    * reference quality-filter battery for web-scale corpora): per
    * document, the surface statistics and the n-gram repetition
    * fractions, plus the combined `keep` verdict.
    *
    *   - surface: word count in [50, 100 000], mean word length in
    *     [3, 10], >= 2 of the 8 Gopher stop words;
    *   - top-n-gram coverage (n = 2,3,4): characters covered by the
    *     single most repeated n-gram / total characters — coverage of
    *     gram g is count(g) x chars(g), and the per-doc signal is the
    *     MAX coverage (deterministic where "most frequent" ties);
    *   - duplicate-n-gram coverage (n = 5,10): characters in occurrences
    *     BEYOND the first of each repeated n-gram / total characters
    *     (the standard non-overlap-counting simplification of Gopher's
    *     position-union measure — monotone in the same signal and exact
    *     for non-overlapping repeats).
    *
    * Line-based rules (bullet/ellipsis line fractions) are omitted: this
    * corpus has no newlines, so they are identically zero — documented
    * rather than silently passing.
    *
    * Dataflow: ONE union of the five n-gram explodes feeds one
    * (doc, n, gram) count, one (doc, n) coverage aggregation, and a
    * conditional-aggregation pivot back to one row per doc — three
    * shuffles total regardless of how many n's are graded, keyed by
    * (doc, gram) so skew is bounded by document length. Surface stats
    * ride the scan (zero extra shuffle).
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ws = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      split(col(textCol), " ").as("ws"))
    val base = ws.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(col("ws")).cast("long").as("n_words"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(col("ws")), 4).as("mean_word_len"),
      expr(s"CAST(size(filter(ws, x -> x IN (${stops.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)")
        .as("stop_hits"))
    def gram(n: Int) = wordGramExpr(n)
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 10)
    val grams = (topNs ++ dupNs).map { n =>
      ws.filter(size(col("ws")) >= n)
        .select(col("doc_id"), lit(n).as("n"), explode(expr(gram(n))).as("g"))
    }.reduce(_ unionAll _)
    val cov = grams
      .groupBy(col("doc_id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n")).agg(
        max(col("c") * length(col("g")).cast("long")).as("top_cov"),
        sum(when(col("c") > 1, (col("c") - 1) * length(col("g")).cast("long"))
          .otherwise(0L)).as("dup_cov"))
    val covCols =
      topNs.map(n => max(when(col("n") === n, col("top_cov"))).as(s"top${n}_cov")) ++
        dupNs.map(n => max(when(col("n") === n, col("dup_cov"))).as(s"dup${n}_cov"))
    val wide = cov.groupBy(col("doc_id")).agg(covCols.head, covCols.tail: _*)
    def frac(covCol: String) =
      round(coalesce(col(covCol), lit(0L)).cast("double") / col("n_chars"), 6)
    base.join(wide, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("mean_word_len"), col("stop_hits"),
        frac("top2_cov").as("top2_frac"),
        frac("top3_cov").as("top3_frac"),
        frac("top4_cov").as("top4_frac"),
        frac("dup5_cov").as("dup5_frac"),
        frac("dup10_cov").as("dup10_frac"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          (col("stop_hits") >= 2L) &&
          (col("top2_frac") <= 0.20) && (col("top3_frac") <= 0.18) &&
          (col("top4_frac") <= 0.16) &&
          (col("dup5_frac") <= 0.15) && (col("dup10_frac") <= 0.10))
  }

  /** Content-addressed shard manifest — the data-versioning record a
    * pipeline publishes alongside [[writeShards]] output: one row per
    * shard with document/token counts, the doc-id range, and an
    * ORDER-SENSITIVE content hash (md5 over the per-doc fingerprints in
    * doc order), so two manifest rows match iff the shards hold the same
    * documents in the same order — cheap diffing across pipeline runs
    * without reading shard bytes.
    *
    * Shard assignment reuses [[packSequences]]' two-pass distributed
    * prefix sum (per-partition totals + broadcast offsets — no global
    * single-partition window), so the manifest is exact at any
    * parallelism. The per-shard collect_list is bounded by
    * tokensPerShard / min-doc-tokens rows — a few thousand fingerprints
    * at real shard sizes, never the corpus.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      tokensPerShard: Long): DataFrame = {
    val packed = packSequences(docs, idCol, textCol, tokensPerShard)
      .withColumnRenamed("seq_id", "shard_id")
    val fp = docs.select(col(idCol).cast("long").as("doc_id"),
      substring(md5(col(textCol)), 1, 8).as("fp"))
    packed.join(fp, "doc_id")
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        md5(array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("fp")))),
          x => x.getField("fp")), ",")).as("shard_hash"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: each doc goes
    * to the shard whose keyed hash h(doc, shard) is highest. Unlike
    * modulo hashing, adding or removing ONE shard reassigns only ~1/n of
    * the docs (the minimal-disruption property consistent hashing is
    * used for) — the right assignment discipline for an incrementally
    * rebalanced corpus. Entirely row-local (the argmax folds over a
    * per-row literal shard array in codegen) — zero shuffle; the only
    * exchange is the nShards-row occupancy aggregate joined back for the
    * balance column. Hash is the house md5-32 ([[graft.Q.md5Bucket32]])
    * so the oracle reproduces every assignment bit-for-bit; hash ties
    * break to the larger shard id in both engines (struct-max vs ORDER
    * BY hv DESC, s DESC).
    */
  def hrwShards(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // the house hash (graft.Q.md5Bucket32) via the Column-API transform
    // lambda — single-sourced so the documented xxhash64 production swap
    // can't miss this site
    val pick = array_max(transform(
      sequence(lit(0), lit(nShards - 1)),
      s => struct(
        Q.md5Bucket32(concat(col(idCol).cast("string"), lit("#"),
          s.cast("string"))).as("h"),
        s.as("s")))).getField("s")
    // materialize the assignment once: the occupancy aggregate and the
    // output join would otherwise each re-evaluate the nShards-way md5
    // argmax per row
    val assigned = docs.select(col(idCol).as("doc_id"), pick.as("shard"))
      .localCheckpoint(true)
    val occupancy = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("shard_n"))
    assigned.join(occupancy, "shard")
      .select(col("doc_id"), col("shard"), col("shard_n"))
  }

  /** Corpus PROFILING — the data-validation pass a pipeline runs on
    * every new snapshot before anything downstream trusts it: one row
    * per profiled column with row/null/distinct counts, min/max, and
    * the modal value (deterministic tiebreak: smallest value among
    * modes). The scalar stats for EVERY column ride one aggregation
    * pass; each mode is a groupBy + global top-1 (TakeOrdered — no full
    * sort). `countDistinct` is exact here because the profile is the
    * oracle-graded contract; at 100 TB swap `approx_count_distinct`
    * (HLL, one pass, no shuffle of distinct values) — the q40 family
    * documents that trade.
    */
  def corpusProfile(docs: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // ALL columns' scalar stats ride ONE aggregation pass over the scan
    // (not one scan per column); only the modes need their own
    // per-column groupBy, which no single pass can express
    val scalars = docs.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
      }: _*)
    cols.map { c =>
      val mode = docs.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("top_value"))
        .agg(count(lit(1)).as("top_count"))
        .orderBy(desc("top_count"), col("top_value"))
        .limit(1)
      // LEFT join against the one-row mode: an all-NULL column has an
      // EMPTY mode table, and an inner/cross join would silently drop
      // the whole profile row (the oracle's scalar subquery keeps it
      // with NULL top_value) — left keeps the row, nulls the mode
      scalars.join(broadcast(mode), lit(true), "left")
        .select(lit(c).as("col_name"), col("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__distinct_$c").as("n_distinct"),
          col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"),
          col("top_value"), col("top_count"))
    }.reduce(_.unionAll(_))
  }

  /** Per-stage ATTRITION report — the observability table every
    * curation run ships beside its output: how many documents each
    * stage admitted, how many the stage dropped, and the drop rate —
    * so a collapsed corpus is traceable to the stage that ate it
    * (a too-sharp quality gate vs an over-eager dedup look identical
    * in the final count, and completely different here).
    *
    * All stage memberships are computed as BOOLEAN COLUMNS on one
    * dataflow (a monotone chain: stage N implies stage N−1), so the
    * whole report is ONE scan + the dedup window + one aggregation —
    * not one job per stage. The stage rows unpivot from the single
    * aggregate row.
    */
  def attritionReport(docs: DataFrame, idCol: String, textCol: String,
      minChars: Int, maxDupWordFrac: Double): DataFrame = {
    require(minChars >= 0, s"minChars must be non-negative, got $minChars")
    require(maxDupWordFrac >= 0 && maxDupWordFrac <= 1,
      s"maxDupWordFrac must be in [0, 1], got $maxDupWordFrac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(col(textCol))))
    val flagged = docs
      .withColumn("__s1", length(col(textCol)) >= minChars)
      .withColumn("__keeper",
        min(when(col("__s1"), col(idCol))).over(w))
      .withColumn("__s2", col("__s1") && col(idCol) === col("__keeper"))
      .withColumn("__ws", split(col(textCol), " "))
      .withColumn("__s3", col("__s2") &&
        (lit(1.0) - size(array_distinct(col("__ws"))).cast("double") /
          size(col("__ws"))) <= maxDupWordFrac)
    val agg = flagged.agg(
      count(lit(1)).as("n0"),
      sum(when(col("__s1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("__s2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("__s3"), 1L).otherwise(0L)).as("n3"))
    agg.select(explode(expr(
        """array(
          |  struct(0 AS stage_idx, 'raw' AS stage, n0 AS n_docs,
          |         CAST(0 AS BIGINT) AS dropped, CAST(0.0 AS DOUBLE) AS drop_rate),
          |  struct(1 AS stage_idx, 'min_length' AS stage, n1 AS n_docs,
          |         n0 - n1 AS dropped, round(CAST(n0 - n1 AS DOUBLE) / n0, 6) AS drop_rate),
          |  struct(2 AS stage_idx, 'exact_dedup' AS stage, n2 AS n_docs,
          |         n1 - n2 AS dropped, round(CAST(n1 - n2 AS DOUBLE) / n1, 6) AS drop_rate),
          |  struct(3 AS stage_idx, 'repetition_gate' AS stage, n3 AS n_docs,
          |         n2 - n3 AS dropped, round(CAST(n2 - n3 AS DOUBLE) / n2, 6) AS drop_rate))""".stripMargin))
        .as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_docs"),
        col("s.dropped"), col("s.drop_rate"))
  }

  /** Split-leakage check — evaluation hygiene for content-addressed
    * splits: which val/test documents share word `n`-grams with ANY
    * train document, and how much of each is covered. Random splits
    * leak near-duplicates across the boundary (the eval set silently
    * overlaps training data and scores inflate); this is the audit a
    * pipeline runs right after [[assignSplits]], the split-boundary
    * twin of q80's benchmark decontamination.
    *
    * Dataflow: one split assignment (pure codegen), per-doc distinct
    * n-grams on the train side, position multiset on the eval side, one
    * gram-keyed semi-join. The EVAL side is the small one by
    * construction (5–10% of the corpus) — at 100 TB broadcast the eval
    * gram set and stream the train side, never the reverse.
    */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], trainSplit: String = "train",
      n: Int = 5): DataFrame = {
    val withSplit = assignSplits(docs, idCol, splits)
    val ws = withSplit.select(col(idCol).as("doc_id"), col("split"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= n)
    val gram = wordGramExpr(n)
    val trainGrams = ws.filter(col("split") === trainSplit)
      .select(explode(expr(s"array_distinct($gram)")).as("kg")).distinct()
    val evalPos = ws.filter(col("split") =!= trainSplit)
      .select(col("doc_id"), col("split"),
        (size(col("ws")) - (n - 1)).cast("long").as("n_positions"),
        explode(expr(gram)).as("kg"))
    evalPos.join(trainGrams, Seq("kg"), "left_semi")
      .groupBy(col("doc_id"), col("split"), col("n_positions"))
      .agg(count(lit(1)).as("n_leaked"))
      .select(col("doc_id"), col("split"), col("n_positions"),
        col("n_leaked"),
        round(col("n_leaked").cast("double") / col("n_positions"), 6)
          .as("leak_frac"))
  }

  /** Per-source lexical-diversity profile: type-token ratio over words
    * and over word 3-grams (the distinct-n diversity signal that flags
    * templated/machine-generated slices of a corpus — a source whose
    * gram TTR collapses is repeating itself). Dataflow: one explode per
    * granularity, each a single-distinct aggregate (Spark plans the
    * two-level partial distinct — no Expand), three tiny per-source
    * tables joined at the end. Shuffle keys are (source, token) —
    * skew-bounded by vocabulary, never by corpus size.
    */
  def corpusDiversity(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val ws = docs.select(col(sourceCol).as("source"), split(col(textCol), " ").as("ws"))
    val words = ws.select(col("source"), explode(col("ws")).as("w"))
    val grams = ws.filter(size(col("ws")) >= 3)
      .select(col("source"), explode(expr(wordGramExpr(3))).as("g"))
    val d = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val wa = words.groupBy(col("source")).agg(
      count(lit(1)).as("n_words"),
      countDistinct(col("w")).as("n_distinct_words"))
    val ga = grams.groupBy(col("source")).agg(
      count(lit(1)).as("n_grams"),
      countDistinct(col("g")).as("n_distinct_grams"))
    // LEFT joins: a source whose documents are all under 3 words has no
    // gram rows — it must still appear (null gram stats), not silently
    // vanish from the profile
    d.join(wa, Seq("source"), "left").join(ga, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_distinct_words"),
        round(col("n_distinct_words").cast("double") / col("n_words"), 6).as("ttr"),
        col("n_grams"), col("n_distinct_grams"),
        round(col("n_distinct_grams").cast("double") / col("n_grams"), 6).as("gram_ttr"))
  }

  /** Jensen–Shannon divergence of each source's unigram distribution
    * from the corpus-wide distribution — the drift/mixture monitor run
    * per ingest batch ("did this crawl slice change register?"). JSD is
    * symmetric and bounded by ln 2, so thresholds transfer across
    * corpora.
    *
    * The textbook formula sums over the full vocabulary per source —
    * a |sources| × |vocab| grid. This uses the identity that for terms
    * ABSENT from a source (p = 0, m = q/2) the Q-side contribution is
    * exactly q·ln 2, so JSD(s) = ½[Σ_{w∈s} p·ln(p/m) + Σ_{w∈s} q·ln(q/m)
    * + (1 − Σ_{w∈s} q)·ln 2] — every sum runs only over the source's own
    * (source, word) count rows. Per-term doubles are cast to DECIMAL
    * before summing, so the result is order-independent and
    * engine-exact.
    */
  /** Exact two-sample Kolmogorov-Smirnov statistic between every pair
    * of groups on a numeric column: D = max |F_a(x) − F_b(x)| over the
    * pooled support — the standard distribution-shift test the JSD
    * drift family (q147) can't provide, since KS sees SHAPE (location/
    * spread) where JSD sees token mass. Used to flag sources whose
    * length/score profile drifted between snapshots.
    *
    * Exact-integer form: with group counts cum_a, cum_b prefix-summed
    * over the pooled distinct values, D = max |cum_a·n_b − cum_b·n_a| /
    * (n_a·n_b) — every max argument a BIGINT, so the single final
    * division is the only float step (the q169 discipline).
    *
    * Scale shape: rows collapse to (group, value) counts in one
    * aggregation; each group PAIR's ECDF walk is a window partitioned
    * by the pair key — pairs distribute across executors; a pair's
    * distinct values must fit one partition (for a single dominant
    * pair, swap in the q143 two-pass prefix over range partitions).
    */
  def ksAllPairs(items: DataFrame, groupCol: String,
      valueCol: Column): DataFrame = {
    // double, not long: a fractional value column (scores in [0,1))
    // truncated to long would collapse every ECDF to one step and
    // report D = 0 on maximally drifted distributions
    val gv = items
      .select(col(groupCol).as("g"), valueCol.cast("double").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val ns = gv.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val pairs = ns.select(col("g").as("ga"), col("n").as("na"))
      .crossJoin(ns.select(col("g").as("gb"), col("n").as("nb")))
      .filter(col("ga") < col("gb"))
    // every (pair, value) row carries the value's count on each side
    val tagged = pairs
      .join(gv.select(col("g").as("ga"), col("v"), col("c").as("ca_d")),
        Seq("ga"), "inner")
      .join(gv.select(col("g").as("gb"), col("v").as("v"), col("c").as("cb_d")),
        Seq("gb", "v"), "left")
      .select(col("ga"), col("gb"), col("na"), col("nb"), col("v"),
        col("ca_d"), coalesce(col("cb_d"), lit(0L)).as("cb_d"))
      .union(
        // values present only on the b side
        pairs
          .join(gv.select(col("g").as("gb"), col("v"), col("c").as("cb_d")),
            Seq("gb"), "inner")
          .join(gv.select(col("g").as("ga"), col("v").as("v"), col("c").as("ca_d")),
            Seq("ga", "v"), "left_anti")
          .select(col("ga"), col("gb"), col("na"), col("nb"), col("v"),
            lit(0L).as("ca_d"), col("cb_d")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    tagged
      .withColumn("cum_a", sum(col("ca_d")).over(w))
      .withColumn("cum_b", sum(col("cb_d")).over(w))
      .withColumn("gap", abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
      .groupBy(col("ga"), col("gb"), col("na"), col("nb"))
      .agg(max(col("gap")).as("gap"))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        round(col("gap").cast("double") / (col("na") * col("nb")), 6).as("ks_d"))
  }

  /** Tie-corrected Mann-Whitney U between every pair of groups on a
    * numeric column — the LOCATION-shift test next to [[ksAllPairs]]'s
    * shape test (KS asks "are the distributions different anywhere";
    * U asks "is one stochastically larger", which is what a "did this
    * source get longer/worse" monitoring question actually means).
    *
    * Exact-integer form (the q169 discipline): over the pooled distinct
    * values with per-side counts ca, cb and the EXCLUSIVE b-side prefix
    * cum_b, twice the U statistic is Σ ca·(2·cum_b + cb) — every term a
    * BIGINT. The tie term Σ(t³−t) rides the same rows. The single
    * float step is the final z = (2U − na·nb) / (2σ) with the standard
    * tie-corrected σ² = na·nb/12·((n+1) − T/(n(n−1))); all-tied
    * degenerate pairs (σ = 0) report NULL z rather than ±∞.
    *
    * Same scale shape as [[ksAllPairs]]: one (group, value) aggregation,
    * pair keys distribute, per-pair windows over the pair's distinct
    * values.
    */
  def mannWhitneyAllPairs(items: DataFrame, groupCol: String,
      valueCol: Column): DataFrame = {
    val gv = items
      .select(col(groupCol).as("g"), valueCol.cast("double").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val ns = gv.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val pairs = ns.select(col("g").as("ga"), col("n").as("na"))
      .crossJoin(ns.select(col("g").as("gb"), col("n").as("nb")))
      .filter(col("ga") < col("gb"))
    val tagged = pairs
      .join(gv.select(col("g").as("ga"), col("v"), col("c").as("ca_d")),
        Seq("ga"), "inner")
      .join(gv.select(col("g").as("gb"), col("v").as("v"), col("c").as("cb_d")),
        Seq("gb", "v"), "left")
      .select(col("ga"), col("gb"), col("na"), col("nb"), col("v"),
        col("ca_d"), coalesce(col("cb_d"), lit(0L)).as("cb_d"))
      .union(
        pairs
          .join(gv.select(col("g").as("gb"), col("v"), col("c").as("cb_d")),
            Seq("gb"), "inner")
          .join(gv.select(col("g").as("ga"), col("v").as("v"), col("c").as("ca_d")),
            Seq("ga", "v"), "left_anti")
          .select(col("ga"), col("gb"), col("na"), col("nb"), col("v"),
            lit(0L).as("ca_d"), col("cb_d")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    val agg = tagged
      .withColumn("cum_b", sum(col("cb_d")).over(w) - col("cb_d"))
      .withColumn("u2_part",
        col("ca_d") * (lit(2L) * col("cum_b") + col("cb_d")))
      .withColumn("t",
        (col("ca_d") + col("cb_d")) * (col("ca_d") + col("cb_d")) *
          (col("ca_d") + col("cb_d")) - (col("ca_d") + col("cb_d")))
      .groupBy(col("ga"), col("gb"), col("na"), col("nb"))
      .agg(sum(col("u2_part")).as("u2"), sum(col("t")).as("tsum"))
    val nAll = (col("na") + col("nb")).cast("double")
    val sig2 = col("na").cast("double") * col("nb") / lit(12.0) *
      ((nAll + 1) - col("tsum").cast("double") / (nAll * (nAll - 1)))
    agg.select(col("ga").as("group_a"), col("gb").as("group_b"),
      col("na").as("n_a"), col("nb").as("n_b"), col("u2"),
      when(sig2 > 0,
        round((col("u2") - col("na") * col("nb")).cast("double") /
          (lit(2.0) * sqrt(sig2)), 6)).as("z"))
  }

  /** Zipf-law fit of the word-frequency distribution: OLS slope of
    * ln(freq) on ln(rank) over the tie-collapsed frequency plot (one
    * point per DISTINCT count; rank = number of words with a strictly
    * higher count, +1 — the standard way ties are drawn on a Zipf
    * plot). A healthy natural-language corpus sits near slope −1;
    * boilerplate/template corpora flatten, id-heavy ones steepen.
    *
    * Shape: one word-count aggregation (corpus-scale, map-side
    * combinable) collapses to one row per DISTINCT count — a table
    * bounded by the largest word frequency's support (hundreds), so
    * the rank window and the closed-form OLS over it are free. Log
    * products are summed in DECIMAL for order independence.
    */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val wc = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val byCount = wc.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc).rowsBetween(Long.MinValue, -1)
    val pts = byCount
      .withColumn("rank", coalesce(sum(col("m")).over(w), lit(0L)) + 1)
      .select(log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val m = pts.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    m.select(col("n").as("n_points"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
        .as("zipf_slope"),
      round((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
           (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
          .cast("double") / col("n"), 6).as("intercept"),
      round(pow((col("n") * col("sxy") - col("sx") * col("sy")).cast("double"), 2) /
        ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
         (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
        .as("r2"))
  }

  /** Good-Turing count-of-counts table — the frequency-spectrum
    * diagnostic behind smoothing and coverage estimates: N_r = how many
    * word types occur exactly r times, and the GT-adjusted count
    * r* = (r+1)·N_{r+1}/N_r (NULL where the next frequency class is
    * empty — simple GT, the smoothed-fit variant plugs into the same
    * table). N_1/N is the Good-Turing unseen-mass estimate a coverage
    * audit reads straight off row r = 1.
    *
    * Shape: word counts (corpus-scale, map-side combinable) collapse to
    * one row per distinct frequency — support-bounded like [[zipfFit]];
    * the r↔r+1 self-join runs on that tiny table.
    */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val wc = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nr = wc.groupBy(col("c")).agg(count(lit(1)).as("n_r"))
    nr.join(nr.select((col("c") - 1).as("c"), col("n_r").as("n_r1")),
        Seq("c"), "left")
      .select(col("c").as("r"), col("n_r"),
        round(((col("c") + lit(1L)) * col("n_r1")).cast("double") /
          col("n_r"), 6).as("r_star"))
  }

  /** Heaps'-law vocabulary-growth fit — V(T) ≈ K·T^β estimated over
    * `nBuckets` corpus prefixes: β near the reference ~0.5 says the
    * corpus keeps yielding new types at the natural rate; β collapsing
    * says duplication/boilerplate (new data stops paying for itself —
    * THE curve a data-acquisition plan consults), β ≈ 1 says id-like
    * vocabulary explosion. The trick that makes prefixes one pass: a
    * word enters the vocabulary at its FIRST occurrence, so cumulative
    * vocabulary per prefix = a running sum over first-occurrence
    * buckets — min(doc_id) per word, never a distinct-per-prefix
    * rescan.
    *
    * Shape: two corpus aggregations (first occurrence per word,
    * tokens per doc-bucket) collapse to an nBuckets-row table; the
    * cumulative window and the [[zipfFit]]-convention log-log OLS run
    * over that. Output: the growth curve with the fit attached.
    */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String,
      gramN: Int = 3, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val n = docs.count()
    // "types" are word `gramN`-grams ([[wordGramExpr]], the shared
    // tokenization): closed word vocabularies saturate instantly and
    // degenerate the fit (all-equal y ⇒ zero OLS denominators); gram
    // types keep growing, which is what Heaps' law measures
    // integral division (mirrors the oracle's `//`): the double floor is
    // exact here — c*nBuckets < 2^53 and the 1e-16 quotient rounding
    // can't bridge the 1/n gap below an integer boundary
    def bucket(c: Column) = floor((c * nBuckets).cast("double") / lit(n.toDouble))
    val ws = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ws"))
    val firstOcc = ws.filter(size(col("ws")) >= gramN)
      .select(col("doc_id"), explode(expr(wordGramExpr(gramN))).as("g"))
      .groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
    val vocabB = firstOcc.groupBy(bucket(col("fd")).as("bucket"))
      .agg(count(lit(1)).as("v_b"))
    val tokensB = ws
      .select(bucket(col("doc_id")).as("bucket"),
        greatest(size(col("ws")) - (gramN - 1), lit(0)).cast("long").as("nt"))
      .groupBy(col("bucket")).agg(sum(col("nt")).as("t_b"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")).rowsBetween(Long.MinValue, 0)
    val pts = tokensB.join(vocabB, Seq("bucket"), "left")
      .withColumn("cum_tokens", sum(col("t_b")).over(w))
      .withColumn("cum_vocab", sum(coalesce(col("v_b"), lit(0L))).over(w))
      .select(col("bucket"), col("cum_tokens"), col("cum_vocab"),
        log(col("cum_tokens").cast("double")).as("x"),
        log(col("cum_vocab").cast("double")).as("y"))
    val m = pts.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    val fit = m.select(
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
        .as("beta"),
      round((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
           (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
          .cast("double") / col("n"), 6).as("intercept"),
      round(pow((col("n") * col("sxy") - col("sx") * col("sy")).cast("double"), 2) /
        ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
         (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
        .as("r2"))
    pts.select(col("bucket"), col("cum_tokens"), col("cum_vocab"))
      .crossJoin(broadcast(fit))
  }

  /** Log-odds-ratio keywords with an informative Dirichlet prior
    * (Monroe, Colaresi & Quinn 2008) — "which words actually
    * distinguish source A from source B", with the variance correction
    * raw frequency ratios and TF-IDF both lack (rare words get huge
    * raw ratios but huge variance too; the z-score ranks honestly).
    * Prior: α_w = α₀·(y_A+y_B)/(n_A+n_B) — the combined corpus as the
    * reference distribution.
    *
    * One word×side count aggregation (map-side combinable), a 1-row
    * totals broadcast, then pure row-local arithmetic — every input an
    * exact integer, double ops in oracle-mirrored order.
    */
  def logOddsKeywords(docs: DataFrame, textCol: String, sourceCol: String,
      srcA: String, srcB: String, alpha0: Double = 10.0,
      minCount: Long = 5L): DataFrame = {
    val counts = docs
      .filter(col(sourceCol).isin(srcA, srcB))
      .select(col(sourceCol).as("src"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w"))
      .agg(sum(when(col("src") === srcA, 1L).otherwise(0L)).as("ya"),
        sum(when(col("src") === srcB, 1L).otherwise(0L)).as("yb"))
    val totals = counts.agg(sum(col("ya")).as("na"), sum(col("yb")).as("nb"))
    counts.filter(col("ya") + col("yb") >= minCount)
      .crossJoin(broadcast(totals))
      .withColumn("aw",
        lit(alpha0) * (col("ya") + col("yb")).cast("double") /
          (col("na") + col("nb")))
      .withColumn("delta",
        log((col("ya") + col("aw")) /
            (col("na") + lit(alpha0) - col("ya") - col("aw"))) -
        log((col("yb") + col("aw")) /
            (col("nb") + lit(alpha0) - col("yb") - col("aw"))))
      .withColumn("z",
        col("delta") / sqrt(lit(1.0) / (col("ya") + col("aw")) +
          lit(1.0) / (col("yb") + col("aw"))))
      .select(col("w"), col("ya"), col("yb"),
        round(col("delta"), 6).as("delta"), round(col("z"), 6).as("z"))
  }

  /** Bigram conditional entropy H(W₂|W₁) (and the unigram entropy it is
    * bounded by) — the sequence-predictability diagnostic: natural prose
    * sits well below H(W); template/boilerplate text collapses toward 0
    * (the next word is determined); shuffled or id-like text pushes the
    * ratio toward 1. H(W₂|W₁) = −Σ p(w₁w₂)·ln(c₁₂/c₁) over observed
    * bigrams. Two linear aggregations (bigrams, unigrams) + one join of
    * bigram rows to their left-word count; per-term DECIMAL sums.
    */
  def bigramEntropy(docs: DataFrame, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val ws = docs.select(split(col(textCol), " ").as("ws"))
    val bi = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val nTot = bi.agg(sum(col("c12")).as("nb"))
    val joined = bi.join(uni, "w1").crossJoin(broadcast(nTot))
    val h = joined.agg(
      max(col("nb")).as("n_bigrams"),
      count(lit(1)).as("n_distinct_bigrams"),
      sum((col("c12").cast("double") / col("nb") *
        log(col("c12").cast("double") / col("c1"))).cast(dec)).as("hc"),
      // unigram entropy of the LEFT-word marginal on the same support
      sum((col("c12").cast("double") / col("nb") *
        log(col("c1").cast("double") / col("nb"))).cast(dec)).as("hu"))
    h.select(col("n_bigrams"), col("n_distinct_bigrams"),
      round(-col("hc").cast("double"), 6).as("cond_entropy"),
      round(-col("hu").cast("double"), 6).as("unigram_entropy"),
      round(col("hc").cast("double") / col("hu").cast("double"), 6)
        .as("entropy_ratio"))
  }

  /** Per-document bigram cross-entropy / perplexity under an add-k
    * smoothed bigram model trained on a REFERENCE slice of the corpus —
    * the CCNet/KenLM quality-filter shape (train an LM on a trusted
    * reference, keep documents that score LOW perplexity under it;
    * reference crates arkflow delegates scoring UDFs to the engine, this
    * is the engine-native form). p(w₂|w₁) = (c₁₂+k)/(c₁+k·V) with
    * counts from the reference slice only and V its distinct-word
    * vocabulary; unseen bigrams coalesce to the smoothing floor.
    *
    * Dataflow: one reference aggregation to the (w₁,w₂) count table
    * plus its left-word marginal; doc bigrams join those by key
    * (shuffle joins — the count table scales with reference vocab, not
    * corpus size; prune with a min-count filter at 100 TB) and collapse
    * straight back to one row per doc. V rides a 1-row broadcast.
    * Per-doc log-prob terms sum in DECIMAL (order-independent), and
    * every probability is a ratio of exact integers plus the
    * binary-exact k = 0.5, so the double trees are engine-identical.
    */
  def ngramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      refPred: Column, k: Double = 0.5): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val ws = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ws"), refPred.as("is_ref"))
    // (w1, w2) struct pairs, same split-on-space tokenization as
    // bigramEntropy (q203) — NOT wordGramExpr's space-joined grams,
    // the left word must stay joinable against its marginal count
    def bigrams(d: DataFrame) = d.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val refBi = bigrams(ws.filter(col("is_ref")))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val refUni = refBi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = ws.filter(col("is_ref"))
      .select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val terms = bigrams(ws)
      .join(refUni, Seq("w1"), "left")
      .join(refBi, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)).cast("double") + lit(k)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("v")))
          .as("lp"))
    terms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast(dec)).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("s").cast("double") / col("n_bigrams"), 6)
          .as("cross_entropy"),
        round(exp(-col("s").cast("double") / col("n_bigrams")), 6)
          .as("ppl"))
  }

  /** Source-concentration report — one row answering "is this corpus a
    * few giant sources wearing a trench coat": Shannon entropy of the
    * source mix and its exponential (the EFFECTIVE number of sources),
    * the Herfindahl-Hirschman index, the Gini coefficient, and the
    * top-1 share. The numbers a mixture planner checks before and
    * after reweighting (q183/q198): effective sources collapsing to ~3
    * while 200 are nominally present is the common failure.
    *
    * One corpus aggregation to k source rows; everything after is
    * window arithmetic over that k-row table (k = |sources|). Gini via
    * the rank identity (2·Σ i·cᵢ/(n·Σc) − (n+1)/n with cᵢ ascending);
    * entropy terms through DECIMAL.
    */
  def concentrationReport(docs: DataFrame, sourceCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c"), col("source"))
    val ranked = per.withColumn("i", row_number().over(w).cast("long"))
    val agg = ranked.agg(
      count(lit(1)).as("n_sources"),
      sum(col("c")).as("n_docs"),
      max(col("c")).as("top1"),
      sum(col("i") * col("c")).as("ric"),
      sum((col("c") * col("c")).cast(dec)).as("cc"))
    val p = col("c").cast("double") / col("n_docs")
    val ent = ranked.crossJoin(broadcast(agg.select(col("n_docs"))))
      .agg(sum((-p * log(p)).cast(dec)).as("h"))
    agg.crossJoin(broadcast(ent)).select(
      col("n_sources"), col("n_docs"),
      round(col("h").cast("double"), 6).as("entropy"),
      round(exp(col("h").cast("double")), 6).as("effective_sources"),
      round(col("cc").cast("double") /
        (col("n_docs").cast("double") * col("n_docs")), 6).as("hhi"),
      round(lit(2.0) * col("ric").cast("double") /
        (col("n_sources").cast("double") * col("n_docs")) -
        (col("n_sources") + 1).cast("double") / col("n_sources"), 6).as("gini"),
      round(col("top1").cast("double") / col("n_docs"), 6).as("top1_share"))
  }

  /** Out-of-vocabulary audit per source against a frequency-cutoff
    * vocabulary (words with corpus count >= `minCount` — a cutoff, not
    * a top-N, so there is no tie-at-the-boundary nondeterminism): the
    * fraction of a source's tokens a fixed vocab would map to UNK.
    * The tokenizer-fit check run per ingest source — a source whose
    * OOV rate is 10× the corpus norm is a different register/language
    * and needs its own vocab budget. Two aggregations (corpus word
    * counts, per-source token counts) + one broadcast-ready semi-join
    * of tokens against the vocab.
    */
  def oovRate(docs: DataFrame, sourceCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = docs.select(col(sourceCol).as("source"),
      explode(split(col(textCol), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("w"))
    val inV = toks.join(vocab, Seq("w"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("in_vocab"))
    toks.groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      .join(inV, Seq("source"), "left")
      .select(col("source"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("in_vocab"), lit(0L))).as("oov_tokens"),
        round((col("n_tokens") - coalesce(col("in_vocab"), lit(0L)))
          .cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** T5/UL2-style span corruption (the q100 FIM discipline applied to
    * masked-denoising): one content-addressed span of `spanLen` words
    * is replaced by a sentinel in the input and becomes the target.
    * The span start derives from the house md5 uniform of the doc id,
    * so the corruption is reproducible run-to-run, grading-stable, and
    * shardable — no RNG state to coordinate across executors. Pure
    * row-local array ops in codegen; docs shorter than spanLen + 2
    * pass through unmasked (span_start = 0, target empty).
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val ws = split(col(textCol), " ")
    val n = size(ws)
    val s = (Q.md5Bucket32(concat(lit("sc:"), col(idCol).cast("string")))
      % greatest(lit(1), n - spanLen + 1)) + 1
    val maskable = n >= spanLen + 2
    docs.select(col(idCol).as("doc_id"), ws.as("ws"), n.as("n_words"),
        when(maskable, s).otherwise(lit(0)).cast("long").as("span_start"))
      .select(col("doc_id"), col("n_words"), col("span_start"),
        // one array concat + ONE join: empty boundary slices vanish in
        // list concatenation, dodging the engines' divergent
        // concat_ws("", ...) empty-part semantics
        when(col("span_start") > 0, array_join(concat(
            slice(col("ws"), lit(1), (col("span_start") - 1).cast("int")),
            array(lit("<extra_id_0>")),
            slice(col("ws"),
              (col("span_start") + spanLen).cast("int"),
              (col("n_words") - col("span_start") - (spanLen - 1)).cast("int"))),
            " "))
          .otherwise(array_join(col("ws"), " ")).as("masked"),
        when(col("span_start") > 0, concat(lit("<extra_id_0> "),
            array_join(slice(col("ws"), col("span_start").cast("int"), lit(spanLen)), " ")))
          .otherwise(lit("")).as("target"))
  }

  /** Context-length planning table: for each candidate max_seq_len, the
    * two costs a truncate-to-L regime pays — tokens LOST past the cut
    * (long docs truncated) and capacity WASTED on padding (short docs
    * one-per-sequence) — so the length is chosen on the measured
    * trade, not folklore. One corpus scan expanded |lens|×, collapsing
    * immediately into per-L aggregates (map-side combinable).
    */
  def contextLengthPlan(docs: DataFrame, textCol: String,
      lens: Seq[Int]): DataFrame = {
    require(lens.nonEmpty, "need at least one candidate length")
    val toks = docs.select(size(split(col(textCol), " ")).cast("long").as("t"))
    toks.withColumn("len", explode(array(lens.map(lit): _*)))
      .groupBy(col("len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("tokens_total"),
        sum((col("t") > col("len")).cast("long")).as("n_trunc_docs"),
        sum(greatest(lit(0L), col("t") - col("len"))).as("tokens_lost"),
        sum(col("len") - least(col("t"), col("len"))).as("pad_tokens"))
      .select(col("len"), col("n_docs"), col("tokens_total"),
        col("n_trunc_docs"), col("tokens_lost"),
        // integer HALF-UP rounding at 6dp: a/b ratios of integer sums
        // land on exact decimal halves (8078/32000 = .2524375), where
        // each engine's double/decimal round() breaks the tie its own
        // way — floor((2e6·a + b)/(2b)) is pure integer arithmetic
        // (exact in doubles far below 2^53), identical everywhere
        (floor((lit(2000000L) * col("tokens_lost") + col("tokens_total"))
          .cast("double") / (lit(2.0) * col("tokens_total"))) / 1000000.0)
          .as("lost_frac"),
        (floor((lit(2000000L) * col("pad_tokens") + col("n_docs") * col("len"))
          .cast("double") / (lit(2.0) * col("n_docs") * col("len"))) / 1000000.0)
          .as("pad_waste_frac"))
  }

  def jsDivergence(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val sc = docs
      .select(col(sourceCol).as("source"), explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val ns = sc.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val tot = sc.groupBy(col("w")).agg(sum(col("c")).as("ca"))
    val na = tot.agg(sum(col("ca")).as("na")) // one row, broadcast
    val t = sc.join(ns, "source").join(tot, "w").crossJoin(broadcast(na))
      .select(col("source"),
        (col("c").cast("double") / col("n")).as("p"),
        (col("ca").cast("double") / col("na")).as("q"))
      .select(col("source"), col("q"),
        (col("p") * log(col("p") / ((col("p") + col("q")) / 2))).as("pterm"),
        (col("q") * log(col("q") / ((col("p") + col("q")) / 2))).as("qterm"))
    t.groupBy(col("source")).agg(
        sum(col("pterm").cast(dec)).as("sp"),
        sum(col("qterm").cast(dec)).as("sq"),
        sum(col("q").cast(dec)).as("qmass"))
      .select(col("source"),
        round((lit(0.5) * (col("sp").cast("double") + col("sq").cast("double") +
          (lit(1.0) - col("qmass").cast("double")) * lit(math.log(2.0)))), 6)
          .as("jsd"))
  }

  // ---- driver-checked query entries ----

  private val Bm25Terms = Seq("spark", "join", "window")

  val queries: Map[String, QueryFn] = Map(
    // even doc ids carry their embedding-table class label; one step
    // spreads them onto odd-id near-duplicates over the q51 pair graph
    "q177_triangles" -> ((s, dir) =>
      triangleStats(
        Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text"),
        "doc_a", "doc_b")
        .orderBy(col("doc_id"))),

    // link prediction wants RECALL: single-row bands (8 bands of 1)
    // give the permissive candidate graph; the graded 2-row default is
    // too precise here (its wedges are already closed — zero output)
    // NO final orderBy, deliberately: the scored candidate list is ~26×
    // the edge count (2.1M rows at sf0.1 — every non-adjacent pair with
    // a common neighbor), and a total sort of the OUTPUT is the one
    // plan no 100 TB run would schedule (the driver's compare is
    // order-insensitive; a real consumer top-k's by aa_score instead).
    // Measured: the sort alone was 3.3 s of the query's 10.7 s.
    "q178_adamic_adar" -> ((s, dir) =>
      adamicAdar(
        Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 1),
        "doc_a", "doc_b")),

    // dense-core extraction over the q178 permissive graph (8 bands of
    // 1 — the recall graph has enough wedges for a 2-core to exist);
    // 3 peel rounds converge on this corpus and the oracle unrolls the
    // same 3, so the object is identical even pre-convergence
    "q196_kcore" -> ((s, dir) =>
      kCore(
        Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 1),
        "doc_a", "doc_b", k = 2, rounds = 3)
        .orderBy(col("doc_id"))),

    "q164_label_prop" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      val seeds = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("doc_id"), col("label"))
      labelPropagationStep(pairs, "doc_a", "doc_b", seeds, "doc_id", "label")
        .orderBy(col("doc_id"))
    }),

    // Cluster resolution over the SAME candidate pairs q51 grades: the
    // pairs are edges; output is every clustered doc with its canonical id.
    "q74_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("cluster").as("cluster_id"))
        .orderBy(col("doc_id"))
    }),

    "q240_group_kfold" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      val cc = connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("cluster").as("cluster_id"))
      groupKFold(docs, "doc_id", cc, k = 5)
        .orderBy(col("doc_id"))
    }),

    // dedup clustering vs the source labeling — singleton docs keep
    // their own id as cluster (every unit labeled in both views)
    "q237_adjusted_rand" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      val cc = connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("cluster").as("cluster_id"))
      val lab = docs.select(col("doc_id"), col("source"))
        .join(cc, Seq("doc_id"), "left")
        .select(coalesce(col("cluster_id"), col("doc_id")).as("a"),
          col("source").as("b"))
      adjustedRand(lab, "a", "b")
    }),

    "q230_modularity" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      val labels = connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("cluster").as("cluster_id"))
      modularity(pairs, "doc_a", "doc_b", labels)
        .orderBy(col("cluster_id"))
    }),

    // Same clustering, but forced down the DISTRIBUTED min-label
    // propagation path (driverThreshold = 0) — the route a 100 TB pair
    // graph takes. Hash-verified against the identical recursive-closure
    // oracle as q74, so the scale path is graded, not just spec-diffed
    // against the driver union-find.
    "q142_cc_distributed" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      connectedComponents(pairs, "doc_a", "doc_b", driverThreshold = 0L)
        .select(col("vertex").as("doc_id"), col("cluster").as("cluster_id"))
        .orderBy(col("doc_id"))
    }),

    "q194_cluster_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      clusterAwareSplits(docs, "doc_id", pairs, "doc_a", "doc_b",
        Seq("train" -> 0.90, "val" -> 0.95, "test" -> 1.0))
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "q75_pack_sequences" -> ((s, dir) =>
      packSequences(Tables.load(s, dir, "documents"), "doc_id", "text", seqLen = 128L)
        .orderBy(col("doc_id"))),

    "q76_repetition_quality" -> ((s, dir) =>
      repetitionQuality(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q77_bm25" -> ((s, dir) =>
      bm25(Tables.load(s, dir, "documents"), "doc_id", "text", Bm25Terms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)),

    // same query terms as q77 — the two ranking models side by side
    "q231_lm_retrieval" -> ((s, dir) =>
      lmRetrieval(Tables.load(s, dir, "documents"), "doc_id", "text",
        Bm25Terms, mu = 50.0, k = 20)
        .orderBy(col("ql_score").desc, col("doc_id"))),

    "q78_stratified_sample" -> ((s, dir) =>
      stratifiedSample(Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> "40", "de" -> "80", "fr" -> "c0"), defaultThreshold = "ff")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))),

    "q79_token_chunks" -> ((s, dir) =>
      tokenChunks(Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Docs 0-24 stand in for a benchmark/eval set; the rest is the corpus.
    "q80_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      decontaminate(docs.filter(col("doc_id") >= 25),
          docs.filter(col("doc_id") < 25), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    "q81_source_cap" -> ((s, dir) =>
      capPerSource(Tables.load(s, dir, "documents"), "doc_id", "source", cap = 3)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))),

    "q108_epoch_shuffle" -> ((s, dir) =>
      deterministicShuffle(Tables.load(s, dir, "documents"), "doc_id", seed = 42L)
        .orderBy(col("doc_id"))),

    "q167_novelty_curve" -> ((s, dir) =>
      noveltyCurve(Tables.load(s, dir, "documents"), "doc_id", "text",
        seed = 42L)
        .orderBy(col("doc_id"))),

    "q110_split_assign" -> ((s, dir) =>
      assignSplits(Tables.load(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.90, "val" -> 0.95, "test" -> 1.0))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))),

    // Two synthetic snapshots carved from one table: v1 = ids < 450,
    // v2 = ids >= 25 with every 10th re-crawled (uppercased). The diff
    // must classify exactly the carving.
    "q114_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") < 450)
      val v2 = docs.filter(col("doc_id") >= 25)
        .withColumn("text",
          when(col("doc_id") % 10 === 0, upper(col("text"))).otherwise(col("text")))
      snapshotDiff(v1, v2, "doc_id", "text")
        .filter(col("status") =!= "unchanged")
        .orderBy(col("doc_id"))
    }),

    // SCD2 over q114's exact snapshot pair: v1 bootstraps the version-1
    // open table at batch 1, merging v2 at batch 2 closes removed/changed
    // docs and opens added/changed ones. Every (version, validity) cell
    // is hash-verified.
    "q145_scd2_merge" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val current = docs.filter(col("doc_id") < 450)
        .select(col("doc_id"), md5(col("text")).as("fp"),
          lit(1L).as("version"), lit(1L).as("valid_from"),
          lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))
      val snapshot = docs.filter(col("doc_id") >= 25)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 10 === 0, upper(col("text")))
            .otherwise(col("text"))).as("fp"))
      scd2Merge(current, snapshot, "doc_id", "fp", batch = 2L)
        .orderBy(col("doc_id"), col("version"))
    }),

    // Keep-best twin of q83 over the SAME candidate pairs: the longest
    // cluster member survives instead of the smallest id.
    "q113_dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      dedupSurvivorsBest(docs, "doc_id",
          Dedup.minhashPairs(docs, "doc_id", "text"), "doc_a", "doc_b",
          score = size(split(col("text"), " ")).cast("long"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "q111_seq_boundaries" -> ((s, dir) =>
      sequenceBoundaries(
        packSequences(Tables.load(s, dir, "documents"), "doc_id", "text", 128L),
        seqLen = 128L)
        .orderBy(col("seq_id"), col("start_in_seq"))),

    // Index side = docs < 400 (the "already-ingested corpus", persisted
    // as band signatures); batch = docs >= 400. Survivors are batch
    // docs with no LSH collision into the index.
    "q109_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val index = Dedup.bandSignatures(docs.filter(col("doc_id") < 400), "doc_id", "text")
      Dedup.incrementalDedup(docs.filter(col("doc_id") >= 400), index, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Same split as q80; the bloom prefilter must not change the answer
    // (no false negatives; the confirm join kills false positives).
    // numBits sized to the 25-doc benchmark side (~3k shingles): the
    // sketch is a plan literal shipped with every task, so it should be
    // 10 bits/item, not the 8 MiB default meant for full eval suites.
    "q105_bloom_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      decontaminateBloom(docs.filter(col("doc_id") >= 25),
          docs.filter(col("doc_id") < 25), "doc_id", "text", n = 5,
          numBits = 1L << 16)
        .orderBy(col("doc_id"))
    }),

    "q84_lm_quality" -> ((s, dir) =>
      lmQuality(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Exact mode so the rank band is oracle-diffable; the approx
    // broadcast-threshold scale path is spec'd against this in
    // OperatorsSpec (recall + plan shape).
    "q104_quantile_filter" -> ((s, dir) =>
      quantileBandFilter(Tables.load(s, dir, "documents"), "lang",
        size(split(col("text"), " ")).cast("long"),
        lo = 0.10, hi = 0.90, exact = true)
        .select(col("doc_id"), col("lang"), col("__score").as("n_words"))
        .orderBy(col("doc_id"))),

    // The SCALE path of the same filter, graded in its own right: at
    // graded SFs every group fits the sketch's exact regime (group size
    // << accuracy), where percentile_approx returns the discrete
    // element quantile_disc computes — so the path that actually runs
    // at 100 TB gets a hash-verified row, and the sketch-error regime
    // beyond it stays covered by the approx-vs-exact tolerance spec.
    "q117_quantile_filter_approx" -> ((s, dir) =>
      quantileBandFilter(Tables.load(s, dir, "documents"), "lang",
        size(split(col("text"), " ")).cast("long"),
        lo = 0.10, hi = 0.90, exact = false)
        .select(col("doc_id"), col("lang"), col("__score").as("n_words"))
        .orderBy(col("doc_id"))),

    // The corpus has no paragraph structure, so the query PLANTS it
    // (the q72-PII / q95-accents pattern): every document gains a
    // header paragraph shared by its source (~100 docs each) and one
    // global footer — both must be stripped, the unique body kept.
    "q120_paragraph_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val synth = docs.select(col("doc_id"),
        concat(lit("shared navigation header for "), col("source"),
          lit("\n\n"), col("text"),
          lit("\n\nstandard copyright footer applies to all documents"))
          .as("text"))
      paragraphDedup(synth, "doc_id", "text", maxDocFreq = 3L)
        .orderBy(col("doc_id"))
    }),

    "q140_attrition" -> ((s, dir) =>
      attritionReport(Tables.load(s, dir, "documents"), "doc_id", "text",
        minChars = 150, maxDupWordFrac = 0.35)
        .orderBy(col("stage_idx"))),

    "q128_corpus_profile" -> ((s, dir) =>
      corpusProfile(Tables.load(s, dir, "documents"),
        Seq("lang", "source", "n_chars"))
        .orderBy(col("col_name"))),

    "q100_fim_split" -> ((s, dir) =>
      fimSplit(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q102_gopher_rules" -> ((s, dir) =>
      gopherRules(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q174_hrw_shards" -> ((s, dir) =>
      hrwShards(Tables.load(s, dir, "documents"), "doc_id", nShards = 16)
        .orderBy(col("doc_id"))),

    "q103_shard_manifest" -> ((s, dir) =>
      shardManifest(Tables.load(s, dir, "documents"), "doc_id", "text",
        tokensPerShard = 512L)
        .orderBy(col("shard_id"))),

    // PageRank link-quality over the deterministic doc link graph —
    // 10 damped power iterations, oracle-matched to the last decimal.
    "q99_pagerank" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      pageRank(docLinkGraph(docs, "doc_id"),
          docs.select(col("doc_id").as("node")), iters = 10)
        .select(col("node").as("doc_id"), col("rank"))
        .orderBy(col("doc_id"))
    }),

    "q217_hits" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      hits(docLinkGraph(docs, "doc_id"),
          docs.select(col("doc_id").as("node")), iters = 8)
        .select(col("node").as("doc_id"), col("authority"), col("hub"))
        .orderBy(col("doc_id"))
    }),

    // The assembled per-document quality-feature table — the
    // materialized signal join a classifier-based filter (FineWeb-style)
    // fits and applies on. One row per doc: surface stats, Gopher
    // repetition fractions, LM quality, span repetition — each the
    // already-verified operator, joined on doc_id (broadcast-eligible
    // outer joins; absent signals null out, e.g. docs below the bigram
    // minimum).
    "q87_quality_features" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val rep = repetitionQuality(docs, "doc_id", "text")
        .select(col("doc_id"), col("dup_word_frac"), col("top_bigram_frac"))
      val lm = lmQuality(docs, "doc_id", "text")
        .select(col("doc_id"), col("sum_logprob"))
      val spans = crossDocRepeats(docs, "doc_id", "text", n = 5)
        .select(col("doc_id"), col("rep_frac").as("cross_doc_rep_frac"))
      base.join(rep, Seq("doc_id"), "left")
        .join(lm, Seq("doc_id"), "left")
        .join(spans, Seq("doc_id"), "left")
        .orderBy(col("doc_id"))
    }),

    // Span-level repetition: 5-gram positions repeating across docs.
    "q144_span_cut" -> ((s, dir) =>
      spanCut(Tables.load(s, dir, "documents"), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))),

    "q146_corpus_diversity" -> ((s, dir) =>
      corpusDiversity(Tables.load(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy(col("source"))),

    "q153_split_leakage" -> ((s, dir) =>
      splitLeakage(Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("train" -> 0.90, "val" -> 0.95, "test" -> 1.0))
        .orderBy(col("doc_id"))),

    "q179_ks_test" -> ((s, dir) =>
      ksAllPairs(Tables.load(s, dir, "documents"), "source", col("n_chars"))
        .orderBy(col("group_a"), col("group_b"))),

    "q201_zipf_fit" -> ((s, dir) =>
      zipfFit(Tables.load(s, dir, "documents"), "text")),

    // lang (4 groups, 6 pairs) rather than q179's source grouping: the
    // location question "is one language's doc length stochastically
    // larger" is the natural monitoring pair for KS's shape question
    "q202_mann_whitney" -> ((s, dir) =>
      mannWhitneyAllPairs(Tables.load(s, dir, "documents"), "lang",
        col("n_chars"))
        .orderBy(col("group_a"), col("group_b"))),

    "q203_bigram_entropy" -> ((s, dir) =>
      bigramEntropy(Tables.load(s, dir, "documents"), "text")),

    "q223_good_turing" -> ((s, dir) =>
      goodTuring(Tables.load(s, dir, "documents"), "text")
        .orderBy(col("r"))),

    "q224_heaps_law" -> ((s, dir) =>
      heapsLaw(Tables.load(s, dir, "documents"), "doc_id", "text",
        nBuckets = 10)
        .orderBy(col("bucket"))),

    // the q209 A/B source pair, keyword-level
    "q225_log_odds" -> ((s, dir) =>
      logOddsKeywords(Tables.load(s, dir, "documents"), "text", "source",
        "src0", "src1")
        .orderBy(col("w"))),

    // reference slice = the four lowest-numbered sources; every other
    // doc is scored against the LM those sources induce
    "q216_ngram_perplexity" -> ((s, dir) =>
      ngramPerplexity(Tables.load(s, dir, "documents"), "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"))
        .orderBy(col("doc_id"))),

    "q205_concentration" -> ((s, dir) =>
      concentrationReport(Tables.load(s, dir, "documents"), "source")),

    "q212_span_corruption" -> ((s, dir) =>
      spanCorruption(Tables.load(s, dir, "documents"), "doc_id", "text",
        spanLen = 3)
        .orderBy(col("doc_id"))),

    "q213_context_plan" -> ((s, dir) =>
      contextLengthPlan(Tables.load(s, dir, "documents"), "text",
        Seq(32, 64, 128, 256))
        .orderBy(col("len"))),

    "q206_oov_rate" -> ((s, dir) =>
      oovRate(Tables.load(s, dir, "documents"), "source", "text",
        minCount = 50L)
        .orderBy(col("source"))),

    "q147_js_divergence" -> ((s, dir) =>
      jsDivergence(Tables.load(s, dir, "documents"), "text", "source")
        .orderBy(col("source"))),

    "q86_cross_doc_repeats" -> ((s, dir) =>
      crossDocRepeats(Tables.load(s, dir, "documents"), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))),

    // Mix to 40% of corpus tokens, upweighting src0/src1 3x/2x.
    "q85_mixture_sample" -> ((s, dir) =>
      mixtureSample(Tables.load(s, dir, "documents"), "doc_id", "text",
        "source", Map("src0" -> 3.0, "src1" -> 2.0),
        defaultWeight = 1.0, budgetFrac = 0.4)
        .orderBy(col("doc_id"))),

    // The dedup DECISION applied: near-dup clusters keep only their
    // canonical doc; everything else passes through.
    "q83_dedup_apply" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      dedupSurvivors(docs, "doc_id",
          Dedup.minhashPairs(docs, "doc_id", "text"), "doc_a", "doc_b")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end curation chain — the composition a real pipeline runs:
    // redact PII, keep one survivor per exact-duplicate group, sample
    // half the corpus content-addressed, pack what remains. Each stage is
    // the already-verified operator; this entry grades the COMPOSITION.
    "q82_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("clean", TextAnalysis.redactPii(col("text")))
      val survivors = docs
        .withColumn("keeper", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5(lower(col("clean"))))))
        .filter(col("doc_id") === col("keeper"))
      val sampled = survivors
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "80")
      packSequences(sampled, "doc_id", "clean", seqLen = 128L)
        .orderBy(col("doc_id"))
    })
  )

  /** The q51 LSH candidate-pair CTE with a pluggable banding: the
    * graded default groups 8 minhashes into 4 bands of 2 rows
    * (`seed // 2`); `seed` gives 8 single-row bands — the PERMISSIVE
    * recall graph link-prediction style analytics want. */
  private def pairsCteBand(bandExpr: String): String =
    s"""w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(ws) - 2),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
      |  FROM w
      |), seeded AS (
      |  SELECT doc_id, seed, shingle
      |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
      |), mh AS (
      |  SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS m
      |  FROM seeded GROUP BY doc_id, seed
      |), bands AS (
      |  SELECT doc_id, $bandExpr AS band,
      |         md5(string_agg(m, '|' ORDER BY m)) AS sig
      |  FROM mh GROUP BY doc_id, $bandExpr
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      |  WHERE a.doc_id < b.doc_id
      |)""".stripMargin

  private val q51PairsCte = pairsCteBand("seed // 2")

  // the q196 oracle unrolls the SAME bounded peel count as the Spark
  // plan (the q99 unrolled-iteration discipline)
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { r =>
      s"""d$r AS (
         |  SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}
         |  ) GROUP BY v
         |), k$r AS (SELECT v FROM d$r WHERE d >= $k),
         |e$r AS (
         |  SELECT a, b FROM e${r - 1}
         |  WHERE a IN (SELECT v FROM k$r) AND b IN (SELECT v FROM k$r)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${pairsCteBand("seed")},
       |e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
       |$peels
       |SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds
       |) GROUP BY v
       |ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q196_kcore" -> kCoreOracle(k = 2, rounds = 3),
    "q99_pagerank" -> pageRankOracle(iters = 10, damping = 0.85),

    "q217_hits" -> hitsOracle(iters = 8),

    "q177_triangles" ->
      s"""WITH $q51PairsCte,
         |tris AS (
         |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
         |  FROM pairs e1
         |  JOIN pairs e2 ON e1.doc_b = e2.doc_a
         |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
         |), pn AS (
         |  SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |    SELECT unnest([a, b, c]) AS v FROM tris) t GROUP BY v
         |), deg AS (
         |  SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
         |    SELECT doc_a AS v FROM pairs
         |    UNION ALL SELECT doc_b FROM pairs) d GROUP BY v
         |)
         |SELECT deg.doc_id, deg.degree,
         |  coalesce(pn.n_tri, 0) AS n_tri,
         |  CASE WHEN deg.degree >= 2 THEN
         |    round(2.0 * coalesce(pn.n_tri, 0) /
         |      (deg.degree * (deg.degree - 1)), 6)
         |  ELSE 0.0 END AS clustering
         |FROM deg LEFT JOIN pn USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q178_adamic_adar" ->
      s"""WITH ${pairsCteBand("seed")},
         |adj AS (
         |  SELECT doc_a AS z, doc_b AS nbr FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs
         |), adjc AS (
         |  SELECT z, nbr FROM (
         |    SELECT z, nbr, row_number() OVER (PARTITION BY z ORDER BY
         |      CAST(CAST('0x' || substring(md5(z || ':' || nbr), 1, 8)
         |        AS UBIGINT) AS BIGINT), nbr) AS rn
         |    FROM adj) t
         |  WHERE rn <= 64
         |), deg AS (
         |  SELECT z, CAST(count(*) AS BIGINT) AS dz FROM adj GROUP BY z
         |), cand AS (
         |  SELECT x.z, x.nbr AS u, y.nbr AS v
         |  FROM adjc x JOIN adjc y ON x.z = y.z
         |  WHERE x.nbr < y.nbr
         |), scored AS (
         |  SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
         |    round(CAST(sum(CAST(1.0 / ln(deg.dz) AS DECIMAL(18,12)))
         |      AS DOUBLE), 6) AS aa_score
         |  FROM cand JOIN deg USING (z)
         |  GROUP BY u, v
         |)
         |SELECT s.u AS doc_a, s.v AS doc_b, s.n_common, s.aa_score
         |FROM scored s
         |WHERE NOT EXISTS (SELECT 1 FROM pairs p
         |  WHERE p.doc_a = s.u AND p.doc_b = s.v)
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q114_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 450
        |), v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN upper(text) ELSE text END) AS fp
        |  FROM documents WHERE doc_id >= 25
        |), d AS (
        |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE
        |      WHEN v1.doc_id IS NULL THEN 'added'
        |      WHEN v2.doc_id IS NULL THEN 'removed'
        |      WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'changed'
        |      ELSE 'unchanged'
        |    END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |)
        |SELECT doc_id, status FROM d WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin,

    "q145_scd2_merge" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 450
        |), v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN upper(text) ELSE text END) AS fp
        |  FROM documents WHERE doc_id >= 25
        |), j AS (
        |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |    v1.fp AS ofp, v2.fp AS nfp
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |)
        |SELECT doc_id, fp, version, valid_from, valid_to, is_current FROM (
        |  SELECT doc_id, ofp AS fp, CAST(1 AS BIGINT) AS version,
        |    CAST(1 AS BIGINT) AS valid_from,
        |    CASE WHEN nfp IS NULL OR nfp <> ofp THEN CAST(2 AS BIGINT) END AS valid_to,
        |    (nfp IS NOT NULL AND nfp = ofp) AS is_current
        |  FROM j WHERE ofp IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nfp,
        |    CAST(CASE WHEN ofp IS NULL THEN 1 ELSE 2 END AS BIGINT),
        |    CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
        |  FROM j WHERE nfp IS NOT NULL AND (ofp IS NULL OR ofp <> nfp)
        |)
        |ORDER BY doc_id, version""".stripMargin,

    "q194_cluster_split" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), cc AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM closure GROUP BY u
         |), rooted AS (
         |  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
         |)
         |SELECT doc_id, cluster_id,
         |  CASE
         |    WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS UBIGINT) < 58982 THEN 'train'
         |    WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS UBIGINT) < 62259 THEN 'val'
         |    ELSE 'test'
         |  END AS split
         |FROM rooted
         |ORDER BY doc_id""".stripMargin,

    "q113_dedup_keep_best" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), membership AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster
         |  FROM closure GROUP BY u
         |), scored AS (
         |  SELECT m.doc_id, m.cluster,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words
         |  FROM membership m JOIN documents d USING (doc_id)
         |), drops AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY cluster ORDER BY n_words DESC, doc_id) AS rk
         |    FROM scored
         |  ) WHERE rk > 1
         |)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY d.doc_id""".stripMargin,

    "q111_seq_boundaries" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM t
        |), s AS (
        |  SELECT doc_id, n_tokens, off,
        |    unnest(generate_series(off // 128, (off + n_tokens - 1) // 128)) AS seq_id
        |  FROM o
        |)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(off - seq_id * 128, 0) AS BIGINT) AS start_in_seq,
        |  CAST(least(off + n_tokens - seq_id * 128, 128) AS BIGINT) AS end_in_seq
        |FROM s
        |ORDER BY seq_id, start_in_seq""".stripMargin,

    "q110_split_assign" ->
      """SELECT doc_id, lang,
        |  CASE
        |    WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT) < 58982 THEN 'train'
        |    WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT) < 62259 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q167_novelty_curve" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |  FROM w
        |), k AS (
        |  SELECT doc_id, sh,
        |    md5('42:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM s
        |), f AS (
        |  SELECT sh, min(k) AS kmin FROM k GROUP BY sh
        |)
        |SELECT k.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN k.k = f.kmin THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  round(CAST(sum(CASE WHEN k.k = f.kmin THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty
        |FROM k JOIN f USING (sh)
        |GROUP BY k.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q108_epoch_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q109_incremental_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM w
        |), seeded AS (
        |  SELECT doc_id, seed, shingle
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
        |), mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS m
        |  FROM seeded GROUP BY doc_id, seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |         md5(string_agg(m, '|' ORDER BY m)) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), collided AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM bands b JOIN bands i ON b.band = i.band AND b.sig = i.sig
        |  WHERE b.doc_id >= 400 AND i.doc_id < 400
        |)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id >= 400
        |  AND d.doc_id NOT IN (SELECT doc_id FROM collided)
        |ORDER BY d.doc_id""".stripMargin,

    "q104_quantile_filter" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id, lang, n_words,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY n_words) AS pr
        |  FROM scored
        |)
        |SELECT doc_id, lang, n_words FROM ranked
        |WHERE pr >= 0.10 AND pr <= 0.90
        |ORDER BY doc_id""".stripMargin,

    "q120_paragraph_dedup" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    'shared navigation header for ' || source || chr(10) || chr(10) ||
        |    text || chr(10) || chr(10) ||
        |    'standard copyright footer applies to all documents' AS text
        |  FROM documents
        |), lists AS (
        |  SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l FROM synth
        |), paras AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS para
        |  FROM lists, unnest(generate_series(1, len(l))) AS t(i)
        |), freq AS (
        |  SELECT md5(para) AS h, count(DISTINCT doc_id) AS docfreq
        |  FROM paras WHERE len(para) >= 10 GROUP BY 1
        |), marked AS (
        |  SELECT p.doc_id, p.pos, p.para,
        |    (f.docfreq IS NOT NULL AND f.docfreq > 3 AND len(p.para) >= 10)
        |      AS dup
        |  FROM paras p LEFT JOIN freq f ON md5(p.para) = f.h
        |)
        |SELECT doc_id,
        |  coalesce(array_to_string(
        |    list(para ORDER BY pos) FILTER (WHERE NOT dup),
        |    chr(10) || chr(10)), '') AS clean_text,
        |  CAST(count(*) FILTER (WHERE NOT dup) AS BIGINT) AS n_kept,
        |  CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dropped
        |FROM marked GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q117_quantile_filter_approx" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |  FROM documents
        |), thr AS (
        |  SELECT lang, quantile_disc(n_words, 0.10) AS t_lo,
        |    quantile_disc(n_words, 0.90) AS t_hi
        |  FROM scored GROUP BY lang
        |)
        |SELECT s.doc_id, s.lang, s.n_words
        |FROM scored s JOIN thr t ON s.lang IS NOT DISTINCT FROM t.lang
        |WHERE s.n_words >= t.t_lo AND s.n_words <= t.t_hi
        |ORDER BY s.doc_id""".stripMargin,

    "q140_attrition" ->
      """WITH f AS (
        |  SELECT doc_id, text, len(text) >= 150 AS s1 FROM documents
        |), k AS (
        |  SELECT doc_id, s1,
        |    min(CASE WHEN s1 THEN doc_id END)
        |      OVER (PARTITION BY md5(lower(text))) AS keeper,
        |    string_split(text, ' ') AS ws
        |  FROM f
        |), g AS (
        |  SELECT s1, s1 AND doc_id = keeper AS s2,
        |    s1 AND doc_id = keeper AND
        |      (1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) <= 0.35 AS s3
        |  FROM k
        |), a AS (
        |  SELECT count(*) AS n0,
        |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM g
        |)
        |SELECT 0 AS stage_idx, 'raw' AS stage, n0 AS n_docs,
        |  CAST(0 AS BIGINT) AS dropped, 0.0 AS drop_rate FROM a
        |UNION ALL SELECT 1, 'min_length', n1, n0 - n1,
        |  round(CAST(n0 - n1 AS DOUBLE) / n0, 6) FROM a
        |UNION ALL SELECT 2, 'exact_dedup', n2, n1 - n2,
        |  round(CAST(n1 - n2 AS DOUBLE) / n1, 6) FROM a
        |UNION ALL SELECT 3, 'repetition_gate', n3, n2 - n3,
        |  round(CAST(n2 - n3 AS DOUBLE) / n2, 6) FROM a
        |ORDER BY stage_idx""".stripMargin,

    "q128_corpus_profile" -> Seq("lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val,
         |  (SELECT CAST($c AS VARCHAR) FROM documents WHERE $c IS NOT NULL
         |   GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) LIMIT 1)
         |    AS top_value,
         |  (SELECT count(*) FROM documents WHERE $c IS NOT NULL
         |   GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) LIMIT 1)
         |    AS top_count
         |FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "q100_fim_split" ->
      """WITH s AS (
        |  SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS len,
        |    CAST(CAST('0x' || substring(md5(text), 1, 8) AS UBIGINT) AS BIGINT)
        |      % CAST(length(text) AS BIGINT) AS h1,
        |    CAST(CAST('0x' || substring(md5(text || '#2'), 1, 8) AS UBIGINT) AS BIGINT)
        |      % CAST(length(text) AS BIGINT) AS h2
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, t, len, h1,
        |    least(h1, h2) AS lo, greatest(h1, h2) AS hi FROM s
        |), p AS (
        |  SELECT doc_id, h1,
        |    substring(t, 1, CAST(lo AS INT)) AS prefix,
        |    substring(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)) AS middle,
        |    substring(t, CAST(hi + 1 AS INT), CAST(len - hi AS INT)) AS suffix
        |  FROM c)
        |SELECT doc_id,
        |  CAST(length(prefix) AS BIGINT) AS n_prefix,
        |  CAST(length(middle) AS BIGINT) AS n_middle,
        |  CAST(length(suffix) AS BIGINT) AS n_suffix,
        |  CASE WHEN h1 % 2 = 0
        |    THEN '<PRE>' || prefix || '<SUF>' || suffix || '<MID>' || middle
        |    ELSE '<SUF>' || suffix || '<PRE>' || prefix || '<MID>' || middle
        |  END AS fim,
        |  CASE WHEN h1 % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode
        |FROM p
        |ORDER BY doc_id""".stripMargin,

    "q102_gopher_rules" ->
      """WITH ws AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws), 4) AS mean_word_len,
        |    CAST(len(list_filter(ws, x -> x IN
        |      ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_hits
        |  FROM ws
        |), grams AS (
        |  SELECT doc_id, 2 AS n, unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> array_to_string(ws[i : i + 1], ' '))) AS g FROM ws WHERE len(ws) >= 2
        |  UNION ALL
        |  SELECT doc_id, 3, unnest(list_transform(generate_series(1, len(ws) - 2),
        |    i -> array_to_string(ws[i : i + 2], ' '))) FROM ws WHERE len(ws) >= 3
        |  UNION ALL
        |  SELECT doc_id, 4, unnest(list_transform(generate_series(1, len(ws) - 3),
        |    i -> array_to_string(ws[i : i + 3], ' '))) FROM ws WHERE len(ws) >= 4
        |  UNION ALL
        |  SELECT doc_id, 5, unnest(list_transform(generate_series(1, len(ws) - 4),
        |    i -> array_to_string(ws[i : i + 4], ' '))) FROM ws WHERE len(ws) >= 5
        |  UNION ALL
        |  SELECT doc_id, 10, unnest(list_transform(generate_series(1, len(ws) - 9),
        |    i -> array_to_string(ws[i : i + 9], ' '))) FROM ws WHERE len(ws) >= 10
        |), cov AS (
        |  SELECT doc_id, n,
        |    max(c * length(g)) AS top_cov,
        |    sum(CASE WHEN c > 1 THEN (c - 1) * length(g) ELSE 0 END) AS dup_cov
        |  FROM (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g)
        |  GROUP BY doc_id, n
        |), wide AS (
        |  SELECT doc_id,
        |    max(CASE WHEN n = 2 THEN top_cov END) AS top2_cov,
        |    max(CASE WHEN n = 3 THEN top_cov END) AS top3_cov,
        |    max(CASE WHEN n = 4 THEN top_cov END) AS top4_cov,
        |    max(CASE WHEN n = 5 THEN dup_cov END) AS dup5_cov,
        |    max(CASE WHEN n = 10 THEN dup_cov END) AS dup10_cov
        |  FROM cov GROUP BY doc_id
        |), f AS (
        |  SELECT b.doc_id, n_words, mean_word_len, stop_hits,
        |    round(CAST(coalesce(top2_cov, 0) AS DOUBLE) / n_chars, 6) AS top2_frac,
        |    round(CAST(coalesce(top3_cov, 0) AS DOUBLE) / n_chars, 6) AS top3_frac,
        |    round(CAST(coalesce(top4_cov, 0) AS DOUBLE) / n_chars, 6) AS top4_frac,
        |    round(CAST(coalesce(dup5_cov, 0) AS DOUBLE) / n_chars, 6) AS dup5_frac,
        |    round(CAST(coalesce(dup10_cov, 0) AS DOUBLE) / n_chars, 6) AS dup10_frac
        |  FROM base b LEFT JOIN wide USING (doc_id)
        |)
        |SELECT doc_id, n_words, mean_word_len, stop_hits,
        |  top2_frac, top3_frac, top4_frac, dup5_frac, dup10_frac,
        |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND stop_hits >= 2
        |    AND top2_frac <= 0.20 AND top3_frac <= 0.18 AND top4_frac <= 0.16
        |    AND dup5_frac <= 0.15 AND dup10_frac <= 0.10 AS keep
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "q174_hrw_shards" ->
      """WITH h AS (
        |  SELECT doc_id, s,
        |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' ||
        |      CAST(s AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) AS hv
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS s) sh
        |), pick AS (
        |  SELECT doc_id, CAST(s AS INT) AS shard
        |  FROM (SELECT doc_id, s,
        |          row_number() OVER (PARTITION BY doc_id
        |            ORDER BY hv DESC, s DESC) AS rn
        |        FROM h) r
        |  WHERE rn = 1
        |), occ AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS shard_n
        |  FROM pick GROUP BY shard
        |)
        |SELECT p.doc_id, p.shard, o.shard_n
        |FROM pick p JOIN occ o USING (shard)
        |ORDER BY doc_id""".stripMargin,

    "q103_shard_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    substring(md5(text), 1, 8) AS fp
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, n_tokens, fp,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        |  FROM toks
        |)
        |SELECT CAST(start_off // 512 AS BIGINT) AS shard_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc,
        |  CAST(max(doc_id) AS BIGINT) AS max_doc,
        |  md5(string_agg(fp, ',' ORDER BY doc_id)) AS shard_hash
        |FROM cum
        |GROUP BY 1
        |ORDER BY shard_id""".stripMargin,

    // transitive closure of the symmetrized pair graph; cluster = min
    // reachable id (incl. self)
    "q164_label_prop" ->
      s"""WITH $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS node, doc_b AS nbr FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs
         |), seeds AS (
         |  SELECT vec_id AS doc_id, label FROM embeddings WHERE vec_id % 2 = 0
         |), votes AS (
         |  SELECT e.node, s.label AS lbl, count(*) AS votes
         |  FROM edges e JOIN seeds s ON s.doc_id = e.nbr
         |  WHERE e.node NOT IN (SELECT doc_id FROM seeds)
         |  GROUP BY e.node, s.label
         |)
         |SELECT node AS doc_id, lbl AS label, votes,
         |  CAST(tot AS BIGINT) AS n_labeled
         |FROM (
         |  SELECT node, lbl, votes,
         |    row_number() OVER (PARTITION BY node
         |      ORDER BY votes DESC, lbl) AS rn,
         |    sum(votes) OVER (PARTITION BY node) AS tot
         |  FROM votes) t
         |WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    "q74_dedup_clusters" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |FROM closure GROUP BY u
         |ORDER BY doc_id""".stripMargin,

    "q240_group_kfold" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), lab AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM closure GROUP BY u
         |), g AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id
         |)
         |SELECT doc_id, group_id,
         |  CAST(CAST('0x' || substring(md5('fold:' || group_id), 1, 8)
         |    AS UBIGINT) AS BIGINT) % 5 AS fold
         |FROM g
         |ORDER BY doc_id""".stripMargin,

    "q237_adjusted_rand" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), lab AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM closure GROUP BY u
         |), ab AS (
         |  SELECT coalesce(l.cluster_id, d.doc_id) AS a, d.source AS b
         |  FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id
         |), cont AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS nij FROM ab GROUP BY a, b
         |), sij AS (
         |  SELECT sum(CAST(nij AS HUGEINT) * (CAST(nij AS HUGEINT) - 1))
         |      AS sij,
         |    CAST(sum(nij) AS BIGINT) AS n
         |  FROM cont
         |), sa AS (
         |  SELECT sum(CAST(ai AS HUGEINT) * (CAST(ai AS HUGEINT) - 1)) AS sa
         |  FROM (SELECT a, sum(nij) AS ai FROM cont GROUP BY a) t
         |), sb AS (
         |  SELECT sum(CAST(bj AS HUGEINT) * (CAST(bj AS HUGEINT) - 1)) AS sb
         |  FROM (SELECT b, sum(nij) AS bj FROM cont GROUP BY b) t
         |)
         |SELECT n,
         |  round(CAST(2 * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1))
         |      * sij - 2 * sa * sb AS DOUBLE) /
         |    CAST((CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1))
         |      * (sa + sb) - 2 * sa * sb AS DOUBLE), 6) AS ari
         |FROM sij CROSS JOIN sa CROSS JOIN sb""".stripMargin,

    "q230_modularity" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), lab AS (
         |  SELECT u AS node, least(u, min(v)) AS cluster_id
         |  FROM closure GROUP BY u
         |), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
         |    SELECT doc_a AS node FROM pairs
         |    UNION ALL SELECT doc_b FROM pairs) t
         |  GROUP BY node
         |), dper AS (
         |  SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_nodes,
         |    CAST(sum(d.degree) AS BIGINT) AS d_c
         |  FROM deg d JOIN lab l ON l.node = d.node GROUP BY l.cluster_id
         |), eper AS (
         |  SELECT la.cluster_id, CAST(count(*) AS BIGINT) AS e_c
         |  FROM pairs p
         |  JOIN lab la ON la.node = p.doc_a
         |  JOIN lab lb ON lb.node = p.doc_b
         |  WHERE la.cluster_id = lb.cluster_id
         |  GROUP BY la.cluster_id
         |), per AS (
         |  SELECT d.cluster_id, d.n_nodes,
         |    CAST(coalesce(e.e_c, 0) AS BIGINT) AS e_intra, d.d_c,
         |    CAST(coalesce(e.e_c, 0) AS DOUBLE) / m -
         |      pow(CAST(d.d_c AS DOUBLE) / (2 * m), 2) AS contrib
         |  FROM dper d LEFT JOIN eper e USING (cluster_id) CROSS JOIN mm
         |), tot AS (
         |  SELECT sum(CAST(contrib AS DECIMAL(38,18))) AS q_d FROM per
         |)
         |SELECT cluster_id, n_nodes, e_intra, d_c,
         |  round(contrib, 6) AS contrib,
         |  round(CAST(q_d AS DOUBLE), 6) AS modularity
         |FROM per CROSS JOIN tot
         |ORDER BY cluster_id""".stripMargin,

    // identical output contract to q74 — the Spark side differs only in
    // which execution path computes the components
    "q142_cc_distributed" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |FROM closure GROUP BY u
         |ORDER BY doc_id""".stripMargin,

    "q75_pack_sequences" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS start_offset,
        |  CAST(coalesce(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) // 128 AS seq_id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q76_repetition_quality" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), bg AS (
        |  SELECT doc_id, len(ws) AS nw,
        |    unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1])) AS bg
        |  FROM ws
        |), top AS (
        |  SELECT doc_id, nw, max(c) AS top_bg FROM (
        |    SELECT doc_id, nw, bg, count(*) AS c FROM bg GROUP BY doc_id, nw, bg
        |  ) GROUP BY doc_id, nw
        |)
        |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
        |  round(1.0 - CAST(len(list_distinct(w.ws)) AS DOUBLE) / len(w.ws), 6)
        |    AS dup_word_frac,
        |  round(CAST(t.top_bg AS DOUBLE) / (t.nw - 1), 6) AS top_bigram_frac
        |FROM ws w JOIN top t ON w.doc_id = t.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    "q231_lm_retrieval" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM ws),
         |toks AS (SELECT doc_id, unnest(ws) AS w FROM ws),
         |cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM toks
         |  WHERE w IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY w),
         |ct AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM toks),
         |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
         |  WHERE w IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id, w),
         |grid AS (SELECT d.doc_id, d.dl, q.w
         |  FROM dl d CROSS JOIN (SELECT unnest([${Bm25Terms.map(t => s"'$t'").mkString(", ")}]) AS w) q),
         |sc AS (
         |  SELECT g.doc_id,
         |    ln((CAST(coalesce(t.tf, 0) AS DOUBLE) +
         |        CAST(50.0 AS DOUBLE) * (CAST(c.cf AS DOUBLE) / ct.ctot)) /
         |       (g.dl + CAST(50.0 AS DOUBLE))) AS lp
         |  FROM grid g
         |  LEFT JOIN tf t ON t.doc_id = g.doc_id AND t.w = g.w
         |  JOIN cf c ON c.w = g.w
         |  CROSS JOIN ct
         |), per AS (
         |  SELECT doc_id, sum(CAST(lp AS DECIMAL(38,18))) AS s
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS ql_score
         |FROM per
         |ORDER BY ql_score DESC, doc_id
         |LIMIT 20""".stripMargin,

    "q77_bm25" ->
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), dl AS (
         |  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM ws
         |), tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM (
         |    SELECT doc_id, unnest(ws) AS w FROM ws
         |  ) WHERE w IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id, w
         |), dfreq AS (
         |  SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
         |), stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
         |), scored AS (
         |  SELECT tf.doc_id, tf.w,
         |    ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) *
         |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS sc
         |  FROM tf JOIN dfreq df ON tf.w = df.w
         |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
         |)
         |SELECT doc_id, round(${Bm25Terms.zipWithIndex.map { case (_, i) => s"s$i" }.mkString(" + ")}, 4) AS bm25
         |FROM (
         |  SELECT doc_id,
         |    ${Bm25Terms.zipWithIndex.map { case (t, i) =>
               s"coalesce(sum(CASE WHEN w = '$t' THEN sc END), 0.0) AS s$i"
             }.mkString(",\n    ")}
         |  FROM scored GROUP BY doc_id
         |)
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q78_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN '80'
        |            WHEN 'fr' THEN 'c0' ELSE 'ff' END
        |ORDER BY doc_id""".stripMargin,

    "q79_token_chunks" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(0, CAST(floor((len(ws) - 1) / 24.0) AS INT)),
        |      i -> {'idx': i, 'txt': array_to_string(ws[i * 24 + 1 : i * 24 + 32], ' ')}))
        |      AS u
        |  FROM ws
        |)
        |SELECT doc_id, CAST(u.idx AS INT) AS chunk_idx, u.txt AS chunk_text,
        |  CAST(len(string_split(u.txt, ' ')) AS BIGINT) AS n_chunk_tokens
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q105_bloom_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))
        |      AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
        |  WHERE len(ws) >= 5
        |), train AS (
        |  SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id >= 25
        |), bench AS (
        |  SELECT DISTINCT doc_id AS bench_id, sh FROM sh WHERE doc_id < 25
        |)
        |SELECT t.doc_id,
        |  count(*) AS n_shared_shingles,
        |  count(DISTINCT b.bench_id) AS n_benchmark_docs
        |FROM train t JOIN bench b ON t.sh = b.sh
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q80_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))
        |      AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
        |  WHERE len(ws) >= 5
        |), train AS (
        |  SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id >= 25
        |), bench AS (
        |  SELECT DISTINCT doc_id AS bench_id, sh FROM sh WHERE doc_id < 25
        |)
        |SELECT t.doc_id,
        |  count(*) AS n_shared_shingles,
        |  count(DISTINCT b.bench_id) AS n_benchmark_docs
        |FROM train t JOIN bench b ON t.sh = b.sh
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q81_source_cap" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 3
        |ORDER BY doc_id""".stripMargin,

    "q87_quality_features" ->
      """WITH rep AS (
        |  SELECT w.doc_id,
        |    round(1.0 - CAST(len(list_distinct(w.ws)) AS DOUBLE) / len(w.ws), 6)
        |      AS dup_word_frac,
        |    round(CAST(t.top_bg AS DOUBLE) / (t.nw - 1), 6) AS top_bigram_frac
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |        WHERE len(string_split(text, ' ')) >= 2) w
        |  JOIN (
        |    SELECT doc_id, nw, max(c) AS top_bg FROM (
        |      SELECT doc_id, nw, bg, count(*) AS c FROM (
        |        SELECT doc_id, len(ws) AS nw,
        |          unnest(list_transform(generate_series(1, len(ws) - 1),
        |            i -> ws[i] || ' ' || ws[i+1])) AS bg
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |              WHERE len(string_split(text, ' ')) >= 2) x
        |      ) GROUP BY doc_id, nw, bg
        |    ) GROUP BY doc_id, nw
        |  ) t ON w.doc_id = t.doc_id
        |), b AS (
        |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(ws) - 1),
        |        i -> {'w1': ws[i], 'w2': ws[i+1]})) AS bg
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
        |    WHERE len(ws) >= 2
        |  )
        |), model AS (
        |  SELECT c12.w1, c12.w2,
        |    round(ln(CAST(c12.c12 AS DOUBLE) / c1.c1), 4) AS lp
        |  FROM (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2) c12
        |  JOIN (SELECT w1, count(*) AS c1 FROM b GROUP BY w1) c1
        |    ON c12.w1 = c1.w1
        |), lm AS (
        |  SELECT doc_id,
        |    CAST(sum(CAST(lp AS DECIMAL(18,4))) AS DOUBLE) AS sum_logprob
        |  FROM b JOIN model ON b.w1 = model.w1 AND b.w2 = model.w2
        |  GROUP BY doc_id
        |), pos AS (
        |  SELECT doc_id, CAST(len(ws) - 4 AS BIGINT) AS n_positions,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> array_to_string(ws[i : i + 4], ' '))) AS kg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |        WHERE len(string_split(text, ' ')) >= 5) w
        |), spans AS (
        |  SELECT doc_id,
        |    round(CAST(count(*) AS DOUBLE) / n_positions, 6) AS cross_doc_rep_frac
        |  FROM pos JOIN (
        |    SELECT kg FROM (
        |      SELECT kg, min(doc_id) AS mn, max(doc_id) AS mx FROM (
        |        SELECT DISTINCT doc_id, kg FROM pos
        |      ) GROUP BY kg
        |    ) WHERE mn <> mx
        |  ) rep USING (kg)
        |  GROUP BY doc_id, n_positions
        |)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  rep.dup_word_frac, rep.top_bigram_frac,
        |  lm.sum_logprob, spans.cross_doc_rep_frac
        |FROM documents d
        |LEFT JOIN rep ON d.doc_id = rep.doc_id
        |LEFT JOIN lm ON d.doc_id = lm.doc_id
        |LEFT JOIN spans ON d.doc_id = spans.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q86_cross_doc_repeats" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5
        |), pos AS (
        |  SELECT doc_id, CAST(len(ws) - 4 AS BIGINT) AS n_positions,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> array_to_string(ws[i : i + 4], ' '))) AS kg
        |  FROM ws
        |), rep AS (
        |  SELECT kg FROM (
        |    SELECT kg, min(doc_id) AS mn, max(doc_id) AS mx FROM (
        |      SELECT DISTINCT doc_id, kg FROM pos
        |    ) GROUP BY kg
        |  ) WHERE mn <> mx
        |)
        |SELECT doc_id, n_positions, count(*) AS n_repeated,
        |  round(CAST(count(*) AS DOUBLE) / n_positions, 6) AS rep_frac
        |FROM pos JOIN rep USING (kg)
        |GROUP BY doc_id, n_positions
        |ORDER BY doc_id""".stripMargin,

    // flagged = 5-gram occurring >= 2 times over ALL positions (within-
    // and cross-document); every covered word position is cut
    "q144_span_cut" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), starts AS (
        |  SELECT doc_id, i AS s, array_to_string(ws[i:i+4], ' ') AS kg
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) g
        |  WHERE len(ws) >= 5
        |), rep AS (
        |  SELECT kg FROM starts GROUP BY kg HAVING count(*) > 1
        |), cov AS (
        |  SELECT DISTINCT doc_id, s + d AS p
        |  FROM starts JOIN rep USING (kg),
        |    LATERAL (SELECT unnest(generate_series(0, 4)) AS d) dd
        |), toks AS (
        |  SELECT doc_id, p, ws[p] AS w
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS p) pp
        |), kept AS (
        |  SELECT t.doc_id, t.p, t.w FROM toks t
        |  WHERE NOT EXISTS (SELECT 1 FROM cov c
        |                    WHERE c.doc_id = t.doc_id AND c.p = t.p)
        |), agg AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text_clean
        |  FROM kept GROUP BY doc_id
        |), cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut FROM cov GROUP BY doc_id
        |)
        |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
        |  coalesce(cnt.n_cut, 0) AS n_cut,
        |  coalesce(agg.text_clean, '') AS text_clean
        |FROM ws w LEFT JOIN cnt USING (doc_id) LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q146_corpus_diversity" ->
      """WITH ws AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), words AS (
        |  SELECT source, unnest(ws) AS w FROM ws
        |), grams AS (
        |  SELECT source, array_to_string(ws[i:i+2], ' ') AS g
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) gg
        |  WHERE len(ws) >= 3
        |), d AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
        |), wa AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words
        |  FROM words GROUP BY source
        |), ga AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_grams
        |  FROM grams GROUP BY source
        |)
        |SELECT source, n_docs, n_words, n_distinct_words,
        |  round(CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS ttr,
        |  n_grams, n_distinct_grams,
        |  round(CAST(n_distinct_grams AS DOUBLE) / n_grams, 6) AS gram_ttr
        |FROM d LEFT JOIN wa USING (source) LEFT JOIN ga USING (source)
        |ORDER BY source""".stripMargin,

    // same 16-bit md5 split buckets as q110; leakage = eval-doc 5-gram
    // positions whose gram appears in any train document
    "q153_split_leakage" ->
      """WITH a AS (
        |  SELECT doc_id, text,
        |    CASE
        |      WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT) < 58982 THEN 'train'
        |      WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT) < 62259 THEN 'val'
        |      ELSE 'test'
        |    END AS split
        |  FROM documents
        |), ws AS (
        |  SELECT doc_id, split, string_split(text, ' ') AS ws FROM a
        |  WHERE len(string_split(text, ' ')) >= 5
        |), tg AS (
        |  SELECT DISTINCT
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> array_to_string(ws[i:i+4], ' '))) AS kg
        |  FROM ws WHERE split = 'train'
        |), ev AS (
        |  SELECT doc_id, split, CAST(len(ws) - 4 AS BIGINT) AS n_positions,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> array_to_string(ws[i:i+4], ' '))) AS kg
        |  FROM ws WHERE split <> 'train'
        |)
        |SELECT doc_id, split, n_positions, CAST(count(*) AS BIGINT) AS n_leaked,
        |  round(CAST(count(*) AS DOUBLE) / n_positions, 6) AS leak_frac
        |FROM ev JOIN tg USING (kg)
        |GROUP BY doc_id, split, n_positions
        |ORDER BY doc_id""".stripMargin,

    // per-term doubles cast to DECIMAL before summing (order-independent,
    // engine-exact); absent-term Q-mass folds to (1 - sum q)*ln 2
    "q179_ks_test" ->
      """WITH gv AS (
        |  SELECT source AS g, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |), ns AS (
        |  SELECT g, sum(c) AS n FROM gv GROUP BY g
        |), prs AS (
        |  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
        |  FROM ns a JOIN ns b ON a.g < b.g
        |), sup AS (
        |  SELECT p.ga, p.gb, p.na, p.nb, u.v
        |  FROM prs p JOIN (SELECT DISTINCT g, v FROM gv) u
        |    ON u.g = p.ga OR u.g = p.gb
        |  GROUP BY p.ga, p.gb, p.na, p.nb, u.v
        |), t AS (
        |  SELECT s.ga, s.gb, s.na, s.nb, s.v,
        |    coalesce(a.c, 0) AS ca_d, coalesce(b.c, 0) AS cb_d
        |  FROM sup s
        |  LEFT JOIN gv a ON a.g = s.ga AND a.v = s.v
        |  LEFT JOIN gv b ON b.g = s.gb AND b.v = s.v
        |), cum AS (
        |  SELECT ga, gb, na, nb,
        |    abs(sum(ca_d) OVER (PARTITION BY ga, gb ORDER BY v) * nb -
        |        sum(cb_d) OVER (PARTITION BY ga, gb ORDER BY v) * na) AS gap
        |  FROM t
        |)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(CAST(max(gap) AS DOUBLE) / (na * nb), 6) AS ks_d
        |FROM cum GROUP BY ga, gb, na, nb
        |ORDER BY group_a, group_b""".stripMargin,

    "q201_zipf_fit" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  GROUP BY w
        |), bc AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS m FROM wc GROUP BY c
        |), pts AS (
        |  SELECT
        |    ln(CAST(coalesce(sum(m) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS DOUBLE)) AS x,
        |    ln(CAST(c AS DOUBLE)) AS y
        |  FROM bc
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(38,12))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,12))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM pts
        |)
        |SELECT n AS n_points,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
        |  round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |    (CAST(n * sxy - sx * sy AS DOUBLE) /
        |     CAST(n * sxx - sx * sx AS DOUBLE))) / n, 6) AS intercept,
        |  round(pow(CAST(n * sxy - sx * sy AS DOUBLE), 2) /
        |    (CAST(n * sxx - sx * sx AS DOUBLE) *
        |     CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        |FROM m""".stripMargin,

    "q202_mann_whitney" ->
      """WITH gv AS (
        |  SELECT lang AS g, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |), ns AS (
        |  SELECT g, sum(c) AS n FROM gv GROUP BY g
        |), prs AS (
        |  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
        |  FROM ns a JOIN ns b ON a.g < b.g
        |), sup AS (
        |  SELECT p.ga, p.gb, p.na, p.nb, u.v
        |  FROM prs p JOIN (SELECT DISTINCT g, v FROM gv) u
        |    ON u.g = p.ga OR u.g = p.gb
        |  GROUP BY p.ga, p.gb, p.na, p.nb, u.v
        |), t AS (
        |  SELECT s.ga, s.gb, s.na, s.nb, s.v,
        |    coalesce(a.c, 0) AS ca_d, coalesce(b.c, 0) AS cb_d
        |  FROM sup s
        |  LEFT JOIN gv a ON a.g = s.ga AND a.v = s.v
        |  LEFT JOIN gv b ON b.g = s.gb AND b.v = s.v
        |), cum AS (
        |  SELECT ga, gb, na, nb,
        |    ca_d * (2 * (sum(cb_d) OVER (PARTITION BY ga, gb ORDER BY v)
        |      - cb_d) + cb_d) AS u2_part,
        |    (ca_d + cb_d) * (ca_d + cb_d) * (ca_d + cb_d) -
        |      (ca_d + cb_d) AS t3
        |  FROM t
        |), a AS (
        |  SELECT ga, gb, na, nb, sum(u2_part) AS u2, sum(t3) AS tsum
        |  FROM cum GROUP BY ga, gb, na, nb
        |)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(u2 AS BIGINT) AS u2,
        |  CASE WHEN CAST(na AS DOUBLE) * nb / 12.0 *
        |      ((CAST(na + nb AS DOUBLE) + 1) - CAST(tsum AS DOUBLE) /
        |       (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1))) > 0
        |    THEN round(CAST(u2 - na * nb AS DOUBLE) /
        |      (2.0 * sqrt(CAST(na AS DOUBLE) * nb / 12.0 *
        |        ((CAST(na + nb AS DOUBLE) + 1) - CAST(tsum AS DOUBLE) /
        |         (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1))))), 6)
        |  END AS z
        |FROM a
        |ORDER BY group_a, group_b""".stripMargin,

    "q223_good_turing" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  GROUP BY w
        |), nr AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY c
        |)
        |SELECT a.c AS r, a.n_r,
        |  round(CAST((a.c + 1) * b.n_r AS DOUBLE) / a.n_r, 6) AS r_star
        |FROM nr a LEFT JOIN nr b ON b.c = a.c + 1
        |ORDER BY r""".stripMargin,

    "q224_heaps_law" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |fo AS (
        |  SELECT g, min(doc_id) AS fd
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(generate_series(1, len(ws) - 2),
        |            i -> array_to_string(ws[i : i + 2], ' '))) AS g
        |        FROM ws WHERE len(ws) >= 3) t
        |  GROUP BY g
        |), vb AS (
        |  SELECT (fd * 10) // n AS bucket, CAST(count(*) AS BIGINT) AS v_b
        |  FROM fo CROSS JOIN nn GROUP BY 1
        |), tb AS (
        |  SELECT (doc_id * 10) // n AS bucket,
        |    CAST(sum(greatest(len(ws) - 2, 0)) AS BIGINT) AS t_b
        |  FROM ws CROSS JOIN nn GROUP BY 1
        |), pts AS (
        |  SELECT t.bucket,
        |    CAST(sum(t.t_b) OVER (ORDER BY t.bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |    CAST(sum(coalesce(v.v_b, 0)) OVER (ORDER BY t.bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |  FROM tb t LEFT JOIN vb v USING (bucket)
        |), xy AS (
        |  SELECT bucket, cum_tokens, cum_vocab,
        |    ln(CAST(cum_tokens AS DOUBLE)) AS x,
        |    ln(CAST(cum_vocab AS DOUBLE)) AS y
        |  FROM pts
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(38,12))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,12))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM xy
        |), fit AS (
        |  SELECT
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
        |    round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |      (CAST(n * sxy - sx * sy AS DOUBLE) /
        |       CAST(n * sxx - sx * sx AS DOUBLE))) / n, 6) AS intercept,
        |    round(pow(CAST(n * sxy - sx * sy AS DOUBLE), 2) /
        |      (CAST(n * sxx - sx * sx AS DOUBLE) *
        |       CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        |  FROM m
        |)
        |SELECT bucket, cum_tokens, cum_vocab, beta, intercept, r2
        |FROM xy CROSS JOIN fit
        |ORDER BY bucket""".stripMargin,

    "q225_log_odds" ->
      """WITH counts AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN src = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ya,
        |    CAST(sum(CASE WHEN src = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS yb
        |  FROM (SELECT source AS src, unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE source IN ('src0', 'src1')) t
        |  GROUP BY w
        |), totals AS (
        |  SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb
        |  FROM counts
        |), z AS (
        |  SELECT w, ya, yb,
        |    CAST(10.0 AS DOUBLE) * CAST(ya + yb AS DOUBLE) / (na + nb) AS aw,
        |    na, nb
        |  FROM counts CROSS JOIN totals
        |  WHERE ya + yb >= 5
        |), d AS (
        |  SELECT w, ya, yb,
        |    ln((ya + aw) / (na + CAST(10.0 AS DOUBLE) - ya - aw)) -
        |    ln((yb + aw) / (nb + CAST(10.0 AS DOUBLE) - yb - aw)) AS delta,
        |    aw
        |  FROM z
        |)
        |SELECT w, ya, yb, round(delta, 6) AS delta,
        |  round(delta / sqrt(CAST(1.0 AS DOUBLE) / (ya + aw) +
        |    CAST(1.0 AS DOUBLE) / (yb + aw)), 6) AS z
        |FROM d
        |ORDER BY w""".stripMargin,

    "q216_ngram_perplexity" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |    (source IN ('src0','src1','src2','src3')) AS is_ref
        |  FROM documents
        |), refbi AS (
        |  SELECT b.w1, b.w2, CAST(count(*) AS BIGINT) AS c12 FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
        |    FROM ws WHERE is_ref AND len(ws) >= 2) t
        |  GROUP BY b.w1, b.w2
        |), refuni AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM refbi GROUP BY w1
        |), voc AS (
        |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM (
        |    SELECT unnest(ws) AS w FROM ws WHERE is_ref) t
        |), docbi AS (
        |  SELECT doc_id, b.w1, b.w2 FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
        |    FROM ws WHERE len(ws) >= 2) t
        |), terms AS (
        |  SELECT d.doc_id,
        |    ln((CAST(coalesce(rb.c12, 0) AS DOUBLE) + 0.5) /
        |       (CAST(coalesce(ru.c1, 0) AS DOUBLE) + 0.5 * v)) AS lp
        |  FROM docbi d
        |  LEFT JOIN refuni ru USING (w1)
        |  LEFT JOIN refbi rb USING (w1, w2)
        |  CROSS JOIN voc
        |), per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    sum(CAST(lp AS DECIMAL(38,18))) AS s
        |  FROM terms GROUP BY doc_id
        |)
        |SELECT doc_id, n_bigrams,
        |  round(-CAST(s AS DOUBLE) / n_bigrams, 6) AS cross_entropy,
        |  round(exp(-CAST(s AS DOUBLE) / n_bigrams), 6) AS ppl
        |FROM per ORDER BY doc_id""".stripMargin,

    "q203_bigram_entropy" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |), bi AS (
        |  SELECT b.w1, b.w2, CAST(count(*) AS BIGINT) AS c12 FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
        |    FROM toks WHERE len(ws) >= 2) t
        |  GROUP BY b.w1, b.w2
        |), uni AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bi GROUP BY w1
        |), nt AS (
        |  SELECT CAST(sum(c12) AS BIGINT) AS nb FROM bi
        |), h AS (
        |  SELECT max(nb) AS n_bigrams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |    sum(CAST(CAST(c12 AS DOUBLE) / nb *
        |      ln(CAST(c12 AS DOUBLE) / c1) AS DECIMAL(38,18))) AS hc,
        |    sum(CAST(CAST(c12 AS DOUBLE) / nb *
        |      ln(CAST(c1 AS DOUBLE) / nb) AS DECIMAL(38,18))) AS hu
        |  FROM bi JOIN uni USING (w1) CROSS JOIN nt
        |)
        |SELECT CAST(n_bigrams AS BIGINT) AS n_bigrams, n_distinct_bigrams,
        |  round(-CAST(hc AS DOUBLE), 6) AS cond_entropy,
        |  round(-CAST(hu AS DOUBLE), 6) AS unigram_entropy,
        |  round(CAST(hc AS DOUBLE) / CAST(hu AS DOUBLE), 6) AS entropy_ratio
        |FROM h""".stripMargin,

    "q205_concentration" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source
        |), r AS (
        |  SELECT source, c,
        |    CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS i
        |  FROM per
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(max(c) AS BIGINT) AS top1,
        |    CAST(sum(i * c) AS BIGINT) AS ric,
        |    sum(CAST(c * c AS DECIMAL(38,18))) AS cc
        |  FROM r
        |), e AS (
        |  SELECT sum(CAST(-(CAST(c AS DOUBLE) / n_docs) *
        |    ln(CAST(c AS DOUBLE) / n_docs) AS DECIMAL(38,18))) AS h
        |  FROM r CROSS JOIN (SELECT n_docs FROM a) t
        |)
        |SELECT n_sources, n_docs,
        |  round(CAST(h AS DOUBLE), 6) AS entropy,
        |  round(exp(CAST(h AS DOUBLE)), 6) AS effective_sources,
        |  round(CAST(cc AS DOUBLE) /
        |    (CAST(n_docs AS DOUBLE) * n_docs), 6) AS hhi,
        |  round(2.0 * CAST(ric AS DOUBLE) /
        |      (CAST(n_sources AS DOUBLE) * n_docs) -
        |    CAST(n_sources + 1 AS DOUBLE) / n_sources, 6) AS gini,
        |  round(CAST(top1 AS DOUBLE) / n_docs, 6) AS top1_share
        |FROM a CROSS JOIN e""".stripMargin,

    "q212_span_corruption" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), b AS (
        |  SELECT doc_id, ws, len(ws) AS n,
        |    CASE WHEN len(ws) >= 5 THEN
        |      CAST(CAST('0x' || substring(md5('sc:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |        AS UBIGINT) AS BIGINT) % greatest(1, len(ws) - 2) + 1
        |    ELSE 0 END AS s
        |  FROM w
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_words,
        |  CAST(s AS BIGINT) AS span_start,
        |  CASE WHEN s > 0 THEN array_to_string(
        |      ws[1:s-1] || ['<extra_id_0>'] || ws[s+3:n], ' ')
        |    ELSE array_to_string(ws, ' ') END AS masked,
        |  CASE WHEN s > 0
        |    THEN '<extra_id_0> ' || array_to_string(ws[s:s+2], ' ')
        |    ELSE '' END AS target
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    "q213_context_plan" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        |  FROM documents
        |), e AS (
        |  SELECT t.t, l.len FROM t
        |  CROSS JOIN (SELECT unnest([32, 64, 128, 256]) AS len) l
        |)
        |SELECT CAST(len AS INT) AS len,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN t > len THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_trunc_docs,
        |  CAST(sum(greatest(0, t - len)) AS BIGINT) AS tokens_lost,
        |  floor(CAST(2000000 * sum(greatest(0, t - len)) + sum(t) AS DOUBLE) /
        |    (2.0 * sum(t))) / 1000000.0 AS lost_frac,
        |  floor(CAST(2000000 * sum(len - least(t, len)) + count(*) * len AS DOUBLE) /
        |    (2.0 * count(*) * len)) / 1000000.0 AS pad_waste_frac
        |FROM e
        |GROUP BY len
        |ORDER BY len""".stripMargin,

    "q206_oov_rate" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        |), vocab AS (
        |  SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w) t
        |  WHERE c >= 50
        |), tot AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY source
        |), inv AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS in_vocab
        |  FROM toks WHERE w IN (SELECT w FROM vocab)
        |  GROUP BY source
        |)
        |SELECT t.source, t.n_tokens,
        |  t.n_tokens - coalesce(i.in_vocab, 0) AS oov_tokens,
        |  round(CAST(t.n_tokens - coalesce(i.in_vocab, 0) AS DOUBLE) /
        |    t.n_tokens, 6) AS oov_rate
        |FROM tot t LEFT JOIN inv i ON t.source = i.source
        |ORDER BY t.source""".stripMargin,

    "q147_js_divergence" ->
      """WITH sc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  GROUP BY source, w
        |), ns AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY source
        |), tot AS (
        |  SELECT w, CAST(sum(c) AS BIGINT) AS ca FROM sc GROUP BY w
        |), nat AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na FROM tot
        |), t AS (
        |  SELECT source,
        |    CAST(c AS DOUBLE) / n AS p,
        |    CAST(ca AS DOUBLE) / na AS q
        |  FROM sc JOIN ns USING (source) JOIN tot USING (w) CROSS JOIN nat
        |)
        |SELECT source,
        |  round(0.5 * (CAST(sum(CAST(p * ln(p / ((p + q) / 2)) AS DECIMAL(38, 18))) AS DOUBLE)
        |    + CAST(sum(CAST(q * ln(q / ((p + q) / 2)) AS DECIMAL(38, 18))) AS DOUBLE)
        |    + (1.0 - CAST(sum(CAST(q AS DECIMAL(38, 18))) AS DOUBLE)) * ln(2)), 6) AS jsd
        |FROM t GROUP BY source
        |ORDER BY source""".stripMargin,

    "q85_mixture_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents
        |), per_source AS (
        |  SELECT source, CAST(sum(nt) AS BIGINT) AS src_tok,
        |    CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 2.0
        |      ELSE 1.0 END AS w
        |  FROM toks GROUP BY source
        |), totals AS (
        |  SELECT CAST(sum(src_tok) AS BIGINT) AS tot_tok, sum(w) AS tot_w
        |  FROM per_source
        |), cuts AS (
        |  SELECT source,
        |    CASE WHEN cutv >= 65536 THEN 'g'
        |         ELSE lpad(lower(to_hex(cutv)), 4, '0') END AS cut_hex
        |  FROM (
        |    -- CAST(0.4 AS DOUBLE) first: DuckDB's bare 0.4 is DECIMAL and
        |    -- would take an exact-decimal route where Spark runs binary
        |    -- doubles — at a 1/65536 quantization boundary the floor()
        |    -- could then disagree by one bucket. Forcing double makes
        |    -- every operation IEEE-identical, same order, both engines.
        |    SELECT source, CAST(floor(least(1.0,
        |        CAST(0.4 AS DOUBLE) * t.tot_tok * p.w / (t.tot_w * p.src_tok)) * 65536)
        |      AS BIGINT) AS cutv
        |    FROM per_source p CROSS JOIN totals t)
        |)
        |SELECT doc_id, source, nt AS n_tokens
        |FROM toks JOIN cuts USING (source)
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cut_hex
        |ORDER BY doc_id""".stripMargin,

    "q84_lm_quality" ->
      """WITH bi AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
        |  WHERE len(ws) >= 2
        |), b AS (
        |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bi
        |), c12 AS (
        |  SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM b GROUP BY w1
        |), model AS (
        |  SELECT c12.w1, c12.w2,
        |    round(ln(CAST(c12.c12 AS DOUBLE) / c1.c1), 4) AS lp
        |  FROM c12 JOIN c1 ON c12.w1 = c1.w1
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(lp AS DECIMAL(18,4))) AS DOUBLE) AS sum_logprob
        |FROM b JOIN model ON b.w1 = model.w1 AND b.w2 = model.w2
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q83_dedup_apply" ->
      s"""WITH RECURSIVE $q51PairsCte,
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), closure(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
         |), drops AS (
         |  SELECT u AS doc_id FROM closure GROUP BY u
         |  HAVING least(u, min(v)) <> u
         |)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY d.doc_id""".stripMargin,

    "q82_curation_pipeline" ->
      """WITH clean AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, 'https://[a-z0-9./]+', '[URL]', 'g'),
        |        '[a-z0-9]+@[a-z0-9]+[.]com', '[EMAIL]', 'g'),
        |      '555-[0-9]{4}', '[PHONE]', 'g') AS clean
        |  FROM documents
        |), survivors AS (
        |  SELECT doc_id, clean FROM (
        |    SELECT doc_id, clean,
        |      min(doc_id) OVER (PARTITION BY md5(lower(clean))) AS keeper
        |    FROM clean
        |  ) WHERE doc_id = keeper
        |), sampled AS (
        |  SELECT doc_id, clean FROM survivors
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        |)
        |SELECT doc_id,
        |  CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CAST(len(string_split(clean, ' ')) AS BIGINT))
        |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS start_offset,
        |  CAST(coalesce(sum(CAST(len(string_split(clean, ' ')) AS BIGINT))
        |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) // 128 AS seq_id
        |FROM sampled
        |ORDER BY doc_id""".stripMargin
  )
}
