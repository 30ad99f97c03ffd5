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

  /** n-word shingles of a text column; whole text when shorter than n. */
  def shingles(text: Column, n: Int): Column = {
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

  /** Candidate near-duplicate pairs (doc_a < doc_b) with the estimated
    * Jaccard = fraction of matching signature slots. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize signatures once: both sides of the self-join (and
    // every CC round downstream) would otherwise re-shingle + re-hash
    // the full corpus.
    val sg = signed(docs, idCol, textCol)
      .select(col("doc_id"), col("sig"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bh").as("bh"))
      .localCheckpoint(true)
    val l = sg.select(col("band"), col("bh"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = sg.select(col("band"), col("bh"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / NumHashes).as("est_jaccard"))
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
      .localCheckpoint(true)
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

  /** Connected components over an undirected edge list (doc_a, doc_b):
    * iterative min-label propagation, one join + groupBy per round
    * (rounds = O(log diameter)). Converges to the component-minimum
    * id — a unique fixpoint, so the result is deterministic. */
  def connectedComponents(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = ids.select(col("doc_id"), col("doc_id").as("dup_group"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 10) {
      val nbrMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id2")).agg(min(col("dup_group")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("doc_id2"), "left")
        .select(col("doc_id"),
          least(col("dup_group"), coalesce(col("nbr_min"), col("dup_group"))).as("dup_group"))
        .localCheckpoint(true)
      converged = next.alias("n")
        .join(labels.alias("o"), col("n.doc_id") === col("o.doc_id"))
        .filter(col("n.dup_group") =!= col("o.dup_group"))
        .isEmpty
      labels = next
      rounds += 1
    }
    labels
  }
}
