package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator appears in `queries` (Spark side) and,
  * when ANSI-SQL-expressible, in `oracleSql` (DuckDB side) with
  * IDENTICAL column aliases and a deterministic ORDER BY on both sides.
  * Money/ratio outputs are rounded DOUBLEs in both engines (never
  * DECIMAL: decimal scale-strings hash differently per engine) so value
  * hashes are bit-stable across summation orders.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pricing.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  // Fixed, deterministic parameters for the parameterized operators.
  private val comparedParts = Seq(25L, 125L, 615L, 1111L)
  private val basketParts = Seq(3L, 42L, 77L, 256L, 512L, 999L, 1024L, 1500L, 1776L, 1999L)
  private val historyPart = 42L

  // Mixture rates for q_mix_sources (sources not listed keep rate 1.0).
  private val mixRates = Map(
    "src0" -> 0.0, "src1" -> 0.25, "src2" -> 0.5, "src3" -> 0.75)

  /** src0+src1 play the "target domain" (the q_dsir_weights
    * convention) — the (doc_id, label) frame the NB classifier entries
    * train against. */
  private def nbDomainLabels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("source").isInCollection(Seq("src0", "src1")).cast("int").as("label"))

  /** MinHash pair set shared by q_dedup_minhash and q_dedup_clusters:
    * cluster resolution consumes the SAME persisted pair frame instead
    * of re-deriving signatures + bucket join from scratch (the pair set
    * is tiny relative to the corpus — MEMORY_AND_DISK persist is safe
    * at any scale).
    *
    * Entries are keyed by (session, dir) and VALIDATED against a data
    * fingerprint (the max modification time under the documents
    * table): rewriting the parquet under a live dir unpersists the
    * stale pair frame and recomputes, so a long-lived service neither
    * serves stale pairs nor accumulates pinned blocks per data
    * version (asserted in spec). */
  private val minhashPairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, DataFrame)]

  /** Duplicate-cluster labels derived from the shared pair frame:
    * q_dedup_clusters and q_dedup_survivors both need the label
    * propagation (the expensive step), so it is cached alongside the
    * pair frame under the same fingerprint/eviction discipline. */
  private val minhashLabelsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, DataFrame)]

  /** Data-version fingerprint for the documents table: max mtime
    * folded with file count and total bytes from the same listing, so
    * a rewrite landing within the filesystem's mtime granularity (or a
    * backend with coarse timestamps) still changes the fingerprint as
    * long as it changes size or layout. */
  private def documentsFingerprint(s: SparkSession, d: String): Long =
    tableFingerprint(s, d, "documents.parquet")

  private def tableFingerprint(s: SparkSession, d: String, table: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$d/$table")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else {
      var m = fs.getFileStatus(path).getModificationTime
      var nFiles = 0L
      var bytes = 0L
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val st = it.next()
        m = math.max(m, st.getModificationTime)
        nFiles += 1
        bytes += st.getLen
      }
      // order-independent mix (the listing order is backend-dependent)
      m * 1000003L + nFiles * 7919L + bytes
    }
  }

  /** Drop every shared pair frame (unpersist + forget): call before
    * re-measuring from a cold start — after a blanket
    * `spark.catalog.clearCache()` the map would otherwise keep handing
    * back frames whose persistence registration is gone, silently
    * losing the shared-cache design on later runs.
    *
    * DELIBERATELY retained: the artifact path caches (trigram/SQ/PQ
    * indexes). Those hold no executor memory — the artifacts live on
    * disk and invalidate by data fingerprint — and the indexed queries
    * exist to measure SERVING from a prebuilt artifact, which a
    * cold-start reset must not silently turn back into a build. */
  private[graft] def clearSharedCaches(): Unit = {
    minhashPairsCache.values.foreach(_._2.unpersist())
    minhashPairsCache.clear()
    minhashLabelsCache.values.foreach(_._2.unpersist())
    minhashLabelsCache.clear()
  }

  private[graft] def minhashPairsShared(s: SparkSession, d: String): DataFrame = {
    // evict entries whose session is gone so a long-lived process never
    // pins stopped sessions or their cached blocks
    minhashPairsCache.keys
      .filter(_._1.sparkContext.isStopped)
      .foreach(minhashPairsCache.remove)
    val fp = documentsFingerprint(s, d)
    minhashPairsCache.get((s, d)) match {
      case Some((cachedFp, df)) if cachedFp == fp => df
      case stale =>
        stale.foreach(_._2.unpersist())
        val fresh = Dedup.minhashPairs(Tables.documents(s, d)).persist()
        minhashPairsCache.put((s, d), (fp, fresh))
        fresh
    }
  }

  /** Persisted trigram index (the GIN analog, tables.sql:48): built
    * once per part-table data version, written GRAM-SORTED via
    * Sinks.writeRangePartitioned so each file covers a disjoint gram
    * range and a probe's `g IN (...)` predicate prunes files and row
    * groups at the scan — the on-disk artifact a 100 TB catalog
    * queries instead of re-exploding itself. The path cache is keyed
    * by data fingerprint; a catalog rewrite triggers a rebuild. */
  private val trigramIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  /** Fingerprint-keyed persisted-artifact path cache shared by the
    * trigram, SQ, and PQ indexes: rebuilds when the source data's
    * fingerprint changes and DELETES the superseded directory — a
    * long-lived session over evolving data would otherwise accrete
    * orphaned index copies under tmpdir forever. */
  private def artifactPath(
      cache: scala.collection.concurrent.TrieMap[(SparkSession, String), (Long, String)],
      s: SparkSession, d: String, fp: Long, prefix: String)(
      build: String => Unit): String = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.get((s, d)) match {
      case Some((cachedFp, p)) if cachedFp == fp => p
      case stale =>
        stale.foreach { case (_, old) =>
          val op = new org.apache.hadoop.fs.Path(old)
          op.getFileSystem(s.sparkContext.hadoopConfiguration)
            .delete(op, true): Unit
        }
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"${prefix}_${java.lang.Long.toHexString(fp)}").getPath
        build(p)
        cache.put((s, d), (fp, p))
        p
    }
  }

  private[graft] def trigramIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "part.parquet")
    val path = artifactPath(trigramIndexPaths, s, d, fp, "graft_trgm_idx") { p =>
      graft.sources.Sinks.writeRangePartitioned(
        Catalog.trigramIndex(Tables.part(s, d)), p, "g", partitions = 8)
    }
    s.read.parquet(path)
  }

  /** Entity-resolution fixtures: the canonical product CATALOG (one
    * row per distinct `p_name + brand` string, keyed by the min
    * partkey that bears it — the master-data dictionary) and the dirty
    * FEED (every part row with a deterministic partkey-keyed name
    * corruption: pass-through / extra type token / dropped first char
    * / e→3 leet typo). Both derivations are plain SQL so the whole
    * match cascade carries a FULL DuckDB oracle. */
  private[graft] def erBase(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey"),
      concat_ws(" ", col("p_name"), lower(col("p_brand"))).as("name"),
      lower(col("p_type")).as("ptype"),
      col("p_retailprice"))

  private[graft] def erCatalog(s: SparkSession, d: String): DataFrame =
    erBase(s, d).groupBy("name").agg(min("p_partkey").as("canon_id"))
      .select("canon_id", "name")

  private[graft] def erFeed(s: SparkSession, d: String): DataFrame =
    erBase(s, d).select(col("p_partkey").as("feed_id"),
      when(col("p_partkey") % 4 === 0, col("name"))
        .when(col("p_partkey") % 4 === 1, concat_ws(" ", col("name"), col("ptype")))
        .when(col("p_partkey") % 4 === 2, expr("substring(name, 2)"))
        .otherwise(expr("replace(name, 'e', '3')")).as("name"),
      col("p_retailprice").as("price"))

  /** Persisted entity-resolution blocking index
    * (Resolution.catalogTokenIndex layout): the df-capped token →
    * canonical posting list, built once per catalog data version —
    * the artifact a daily 100 TB feed resolves through without
    * re-deriving the dictionary. Fingerprint-keyed like the trigram
    * index. */
  private val erIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  /** Persisted window-hash count index (Dedup.substringHashIndex over
    * the seed half of the corpus) — the artifact the incremental
    * exact-substring gate probes; fingerprint-keyed like every index. */
  private val esIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def esIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "documents.parquet")
    val path = artifactPath(esIndexPaths, s, d, fp, "graft_es_idx") { p =>
      operators.Dedup.substringHashIndex(
          Tables.documents(s, d).filter(col("doc_id") % 2 === 0))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  private[graft] def erIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "part.parquet")
    val path = artifactPath(erIndexPaths, s, d, fp, "graft_er_idx") { p =>
      operators.Resolution.catalogTokenIndex(erCatalog(s, d), dfCap = 100)
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted rank-1 MATCH frame (the q_entity_match result):
    * survivorship (and any other downstream consumer) folds the same
    * persisted match instead of re-running the candidate-scoring
    * cascade — the match is an upstream product like the rank/LM
    * artifacts, rebuilt only when the part table's fingerprint moves
    * (feed and catalog both derive from it). Bit-equality with the
    * inline match is asserted in spec; the driver's hash gate proves
    * the folded result against the full-cascade oracle. */
  private val erMatchPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def erMatchShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "part.parquet")
    val path = artifactPath(erMatchPaths, s, d, fp, "graft_er_match") { p =>
      operators.Resolution.entityMatchWithIndex(erFeed(s, d), erCatalog(s, d),
          erIndexShared(s, d), minScoreMicro = 500000L, k = 1)
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted SemDeDup cluster assignment (vec_id, cid, sim) — the
    * slim artifact the serving path consumes instead of re-training
    * Lloyd and re-scanning the n·k centroid dots per run;
    * fingerprint-keyed over the embeddings table. */
  private val sdAssignPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def sdAssignShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val path = artifactPath(sdAssignPaths, s, d, fp, "graft_sd_assign") { p =>
      Similarity.semDeDupAssign(Tables.embeddings(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted IMAGE FINGERPRINT artifact (media_id, codec, ahash,
    * dhash over the synthetic image corpus) — render + decode +
    * fingerprint happen ONCE per documents data version, then every
    * consumer (near-dup pairs, survivors, the streaming gate) serves
    * from the slim integer frame: the cpIndexShared posture for the
    * image modality. In production the fingerprints are a landing-time
    * byproduct of ingest (the decode already ran for feature
    * extraction); re-rendering the corpus per downstream query was the
    * r11 bench's honest 6.6 s reading on q_image_survivors. */
  private val imageFpPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def imageFpShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "documents.parquet")
    val path = artifactPath(imageFpPaths, s, d, fp, "graft_img_fp") { p =>
      graft.sources.Multimodal.imageFingerprints(
          graft.sources.Multimodal.syntheticImages(Tables.documents(s, d)))
        .toDF()
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted component artifact — yesterday's canonical co-purchase
    * edges + their (id, label) components under one root (the
    * pagerank-artifact posture): componentsIncremental folds today's
    * edge delta into it without re-contracting untouched components.
    * "Yesterday" = the graph without the l_orderkey %20==9 order
    * slice; pair counts only GROW with more orders, so the prior
    * edge set is a subset of the full one and prior ∪ delta == full
    * (what the shared oracle's hash gate then proves). */
  private val cpIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def cpIndexShared(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val root = cpIndexRoot(s, d)
    (s.read.parquet(s"$root/edges"), s.read.parquet(s"$root/labels"))
  }

  /** The SIGNED edge delta between the persisted prior graph (orders
    * without the %20==9 slice) and TODAY'S graph (orders without the
    * %20==5 slice) — the [[operators.Etl.snapshotDiff]] posture
    * applied to edges: adds are pairs that reach the >= 2-order
    * support bar only with the slice-9 orders back, removals are
    * pairs that LOSE it when the slice-5 orders delist (the
    * price-data analog: a store delisting a product shrinks the
    * co-purchase graph — upsert semantics include replacement, not
    * just growth). Served from the persisted adds/removals faces of
    * the cpIndex artifact (built once per data version, like every
    * indexed family — in production the slices arrive from
    * snapshotDiff; the q_*_delete entries measure the incremental
    * FOLD, not a per-run re-derivation of the delta). Returns
    * (adds, removals) as raw (src, dst, w) frames. */
  private def signedGraphDelta(
      s: SparkSession, d: String): (DataFrame, DataFrame) =
    (cpAddsShared(s, d), cpRemovalsShared(s, d))

  /** The signed delta's faces individually — what the signed stream
    * harness stages as its (src, dst, op) source. */
  private[graft] def cpAddsShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/adds")

  private[graft] def cpRemovalsShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/removals")

  /** The prior graph's (node, coreness) — the third face of the
    * persisted graph artifact, what q_coreness_incremental folds a
    * delta into (built once per data version alongside the labels). */
  private[graft] def cpCorenessShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/coreness")

  /** The prior graph's triangles() output — the fourth face, what
    * q_triangles_incremental folds a delta into. */
  private[graft] def cpTrianglesShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/triangles")

  /** The prior graph's 3-truss (kTruss output) — the fifth face, what
    * q_ktruss_incremental folds a delta into. */
  private[graft] def cpTrussShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/truss")

  /** The prior graph WITH WEIGHTS (a, b, w) — the sixth face, the
    * additive state q_stream_pagerank's weight increments fold into
    * (pair counts only grow, so full − prior is strictly positive). */
  private[graft] def cpWeightedShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/wedges")

  /** The prior graph's rank frame (node, rank_micro) — the seventh
    * face, the warm-start point q_stream_pagerank serves from. */
  private[graft] def cpRanksShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/ranks")

  /** The WEIGHTED signed delta (a, b, dw) between the prior and
    * today's co-purchase graphs — the tenth face, what
    * q_pagerank_delete folds into the weighted prior. */
  private[graft] def cpWDeltaShared(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${cpIndexRoot(s, d)}/wdeltas")

  private def cpIndexRoot(s: SparkSession, d: String): String = {
    val fp = tableFingerprint(s, d, "lineitem.parquet")
    artifactPath(cpIndexPaths, s, d, fp, "graft_cp_idx") { p =>
      // ONE basket-pair aggregation feeds all seven faces: the
      // weighted frame is computed first and the unweighted canonical
      // edge set derives from it by projection (coPurchaseGraph
      // already emits canonical a<b pairs), instead of re-running the
      // heavy fact-table pair scan twice
      val weighted = Purchases.coPurchaseGraph(
          Tables.lineitem(s, d).filter(col("l_orderkey") % 20 =!= 9),
          minCount = 2L)
        .select(col("src").as("a"), col("dst").as("b"), col("w"))
        .localCheckpoint()
      val prior = operators.Graph.canonicalEdges(
          weighted.select(col("a").as("src"), col("b").as("dst")))
        .localCheckpoint()
      prior.write.mode("overwrite").parquet(s"$p/edges")
      operators.Dedup.duplicateLabelsStar(
          prior.select(col("a").as("doc_a"), col("b").as("doc_b")))
        .write.mode("overwrite").parquet(s"$p/labels")
      operators.Graph.corenessSharded(
          prior.select(col("a").as("src"), col("b").as("dst")))
        .write.mode("overwrite").parquet(s"$p/coreness")
      operators.Graph.triangles(
          prior.select(col("a").as("src"), col("b").as("dst")))
        .write.mode("overwrite").parquet(s"$p/triangles")
      operators.Graph.kTrussSharded(
          prior.select(col("a").as("src"), col("b").as("dst")), 3)
        .write.mode("overwrite").parquet(s"$p/truss")
      weighted.write.mode("overwrite").parquet(s"$p/wedges")
      operators.Graph.pageRank(
          weighted.select(col("a").as("src"), col("b").as("dst"), col("w")))
        .select("node", "rank_micro")
        .write.mode("overwrite").parquet(s"$p/ranks")
      // the SIGNED delta faces (eighth/ninth): adds/removals between
      // the prior graph and TODAY'S (slice-5-delisted) one — in
      // production these arrive from snapshotDiff; here they build
      // once per data version so the q_*_delete entries measure the
      // incremental FOLD, not a per-run re-derivation of the delta
      val todayW = Purchases.coPurchaseGraph(
          Tables.lineitem(s, d).filter(col("l_orderkey") % 20 =!= 5),
          minCount = 2L)
        .select(col("src").as("a"), col("dst").as("b"), col("w"))
        .localCheckpoint()
      val today = todayW.select("a", "b").localCheckpoint()
      today.join(prior, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        .write.mode("overwrite").parquet(s"$p/adds")
      prior.join(today, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        .write.mode("overwrite").parquet(s"$p/removals")
      // the WEIGHTED signed delta (tenth face): per-pair dw between
      // the prior and today's weighted graphs — what pageRankSigned
      // folds (a vanished pair carries dw = −w_prior, a new one its
      // full weight, a support shift the difference)
      todayW.withColumnRenamed("w", "tw")
        .join(weighted.withColumnRenamed("w", "pw"), Seq("a", "b"), "full_outer")
        .select(col("a"), col("b"),
          (coalesce(col("tw"), lit(0L)) - coalesce(col("pw"), lit(0L))).as("dw"))
        .filter(col("dw") =!= 0L)
        .write.mode("overwrite").parquet(s"$p/wdeltas")
    }
  }

  /** The expectations base/delta load split shared by
    * q_expectations_incremental and q_expectations_indexed: the base
    * load misses 5 % of lineitem AND 5 % of the part dimension; the
    * delta delivers both — the late parents RESOLVE fk orphans the
    * base alone would report, so the merge semantics (not just the
    * counters) are exercised. */
  private[graft] def expBaseTables(
      s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "lineitem" -> Tables.lineitem(s, d).filter(col("l_orderkey") % 20 =!= 7),
    "orders" -> Tables.orders(s, d), "customer" -> Tables.customer(s, d),
    "part" -> Tables.part(s, d).filter(col("p_partkey") % 20 =!= 3))

  private[graft] def expDeltaTables(
      s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "lineitem" -> Tables.lineitem(s, d).filter(col("l_orderkey") % 20 === 7),
    "orders" -> Tables.orders(s, d).limit(0),
    "customer" -> Tables.customer(s, d).limit(0),
    "part" -> Tables.part(s, d).filter(col("p_partkey") % 20 === 3))

  /** Persisted data-quality verdict partials (Expectations.partials
    * over the BASE load) — the artifact a nightly delta folds into
    * with NO base-table re-verify; fingerprint-keyed over ALL FOUR
    * battery tables (any table rewrite invalidates), like every other
    * index artifact. */
  private val expPartialsPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def expPartialsShared(s: SparkSession, d: String): DataFrame = {
    val fp = Seq("lineitem.parquet", "orders.parquet",
        "customer.parquet", "part.parquet")
      .map(tableFingerprint(s, d, _))
      .reduceLeft(_ * 1000003L + _)
    val path = artifactPath(expPartialsPaths, s, d, fp, "graft_exp_partials") { p =>
      // partitionBy(kind): the artifact is dominated by per-key
      // uniqueness/RI rows, and the serving split filters each verdict
      // branch by kind — partition layout turns those filters into
      // file pruning (the scalar branch never opens the key
      // partitions). Sorted within by (check_seq, k) so row-group
      // stats prune further on check-level probes.
      // repartitionByRange (not repartition(kind)): a pure kind
      // partitioner would funnel the whole per-key mass through ONE
      // write task and one giant file; the range split keeps the key
      // partitions parallel AND (check_seq, k)-sorted within files
      operators.Expectations.partials(expBaseTables(s, d), expectationChecks)
        .repartitionByRange(col("kind"), col("check_seq"), col("k"))
        .sortWithinPartitions("check_seq", "k")
        .write.mode("overwrite").partitionBy("kind").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted int8 ANN index (Similarity.sqIndex layout): built once
    * per embeddings data version and READ back for the indexed query —
    * the on-disk artifact a 100 TB corpus scores from (~4× smaller
    * than the fp embeddings) instead of re-quantizing itself per
    * query. Fingerprint-keyed like the trigram index. */
  private val sqIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def sqIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val path = artifactPath(sqIndexPaths, s, d, fp, "graft_sq_idx") { p =>
      Similarity.sqIndex(Tables.embeddings(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted PQ artifact pair (codes + codebooks under one root),
    * fingerprint-keyed like the SQ and trigram indexes. Returns the
    * parquet-backed (codes, codebooks) frames. */
  private val pqIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def pqIndexShared(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val root = artifactPath(pqIndexPaths, s, d, fp, "graft_pq_idx") { p =>
      val (codes, cents) = Similarity.pqIndex(Tables.embeddings(s, d))
      codes.write.mode("overwrite").parquet(s"$p/codes")
      cents.write.mode("overwrite").parquet(s"$p/codebooks")
    }
    (s.read.parquet(s"$root/codes"), s.read.parquet(s"$root/codebooks"))
  }

  /** Persisted OPQ artifact triple (rotated-space codes + codebooks +
    * the rotation matrix under one root), fingerprint-keyed like the
    * SQ/PQ indexes. Returns the parquet-backed
    * (codes, codebooks, rotation) frames. */
  private val opqIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def opqIndexShared(
      s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val root = artifactPath(opqIndexPaths, s, d, fp, "graft_opq_idx") { p =>
      val (codes, cents, rot) = Similarity.opqPqIndex(Tables.embeddings(s, d))
      codes.write.mode("overwrite").parquet(s"$p/codes")
      cents.write.mode("overwrite").parquet(s"$p/codebooks")
      rot.write.mode("overwrite").parquet(s"$p/rotation")
    }
    (s.read.parquet(s"$root/codes"), s.read.parquet(s"$root/codebooks"),
      s.read.parquet(s"$root/rotation"))
  }

  /** Persisted IVF artifact pair (posting-list assignments +
    * centroids under one root), fingerprint-keyed like the SQ/PQ
    * indexes. Returns the parquet-backed (assignments, centroids)
    * frames. */
  private val ivfIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def ivfIndexShared(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val root = artifactPath(ivfIndexPaths, s, d, fp, "graft_ivf_idx") { p =>
      val (assign, cents) = Similarity.ivfIndex(Tables.embeddings(s, d))
      assign.write.mode("overwrite").parquet(s"$p/assign")
      cents.write.mode("overwrite").parquet(s"$p/centroids")
    }
    (s.read.parquet(s"$root/assign"), s.read.parquet(s"$root/centroids"))
  }

  /** The full index-family matrix both ANN meters (recall + MRR/NDCG)
    * report on. */
  private val annMeterMethods =
    Seq("lsh", "ivf", "sq", "pq", "ivf_sq", "ivf_pq", "opq")

  /** Persisted-artifact serving hooks shared by q_ann_recall and
    * q_ann_metrics: every trained family serves from its
    * fingerprint-keyed parquet artifact (bit-equal to inline —
    * spec-asserted — so the meters never retrain what already
    * persists; lsh alone has nothing to train or persist). */
  private def annServingImpls(
      s: SparkSession, d: String): Map[String, () => DataFrame] = Map(
    "ivf" -> (() => {
      val (assign, cents) = ivfIndexShared(s, d)
      Similarity.embedIvfTopKFromIndex(assign, cents, Tables.embeddings(s, d))
    }),
    "sq" -> (() => Similarity.embedSqTopKFromIndex(
      sqIndexShared(s, d), Tables.embeddings(s, d))),
    "pq" -> (() => {
      val (codes, cents) = pqIndexShared(s, d)
      Similarity.embedPqTopKFromIndex(codes, cents, Tables.embeddings(s, d))
    }),
    "ivf_sq" -> (() => {
      val (assign, cents) = ivfIndexShared(s, d)
      Similarity.embedIvfSqTopKFromIndex(
        assign, cents, sqIndexShared(s, d), Tables.embeddings(s, d))
    }),
    "ivf_pq" -> (() => {
      val (assign, coarse) = ivfIndexShared(s, d)
      val (codes, cbooks) = pqIndexShared(s, d)
      Similarity.embedIvfPqTopKFromIndex(
        assign, coarse, codes, cbooks, Tables.embeddings(s, d))
    }),
    "opq" -> (() => {
      val (codes, cents, rot) = opqIndexShared(s, d)
      Similarity.embedOpqPqTopKFromIndex(
        codes, cents, rot, Tables.embeddings(s, d))
    }))

  /** Persisted BPE tokenizer artifact (Bpe.segmentsIndex layout — the
    * slim word → subword-count table): the merge loop trains once per
    * documents data version; every tokenize after that READS the
    * vocabSize-row parquet and joins, exactly how a production
    * tokenizer file is trained offline and applied across 100 TB.
    * Fingerprint-keyed like the trigram/SQ/PQ indexes. */
  private val bpeIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  /** Persisted unigram LM artifact (TextAnalysis.termCounts layout):
    * trained once per documents data version, read back for every
    * scoring pass — the perplexity serving path. Fingerprint-keyed
    * like the trigram/SQ/PQ/BPE indexes. */
  private val lmIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def lmIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(lmIndexPaths, s, d, fp, "graft_lm_idx") { p =>
      operators.TextAnalysis.termCounts(Tables.documents(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted Kneser-Ney LM artifact (TextAnalysis.knModel layout —
    * the slim floored bigram-type table the whole model derives from):
    * trained once per documents data version, read back for every
    * scoring pass. Fingerprint-keyed like the unigram LM artifact. */
  private val knIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def knIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(knIndexPaths, s, d, fp, "graft_kn_idx") { p =>
      operators.TextAnalysis.knModel(Tables.documents(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted "yesterday's" PageRank artifact (Graph.pageRank output
    * on the co-purchase graph built WITHOUT orders ≡ 0 mod 19 — the
    * stale-snapshot stand-in): written once per lineitem data version,
    * read back as the warm start for every incremental ranking pass.
    * Fingerprint-keyed like the LM/postings artifacts. */
  private val rankIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def rankIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = tableFingerprint(s, d, "lineitem.parquet")
    val path = artifactPath(rankIndexPaths, s, d, fp, "graft_rank_idx") { p =>
      operators.Graph.pageRank(
          Purchases.coPurchaseGraph(
            Tables.lineitem(s, d).filter(col("l_orderkey") % 19 =!= 0),
            minCount = 2L))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted BM25 index pair (term-sorted postings + corpus meta
    * under one root — [[operators.Retrieval.bm25Index]] layout): built
    * once per documents data version; postings are written RANGE-
    * PARTITIONED AND SORTED on `term` so a query's pushed
    * `term IN (...)` filter prunes files and row groups at the scan —
    * the on-disk inverted index a 100 TB corpus searches instead of
    * re-tokenizing itself (the trigram-index posture applied to
    * free-text retrieval). */
  private val bm25IndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def bm25IndexShared(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val fp = documentsFingerprint(s, d)
    val root = artifactPath(bm25IndexPaths, s, d, fp, "graft_bm25_idx") { p =>
      val (postings, meta) = operators.Retrieval.bm25Index(Tables.documents(s, d))
      graft.sources.Sinks.writeRangePartitioned(
        postings, s"$p/postings", "term", partitions = 8)
      meta.write.mode("overwrite").parquet(s"$p/meta")
    }
    (s.read.parquet(s"$root/postings"), s.read.parquet(s"$root/meta"))
  }

  /** Persisted corpus-grep trigram postings ([[operators.Retrieval
    * .grepIndex]] layout): ~1 row per corpus byte, range-partitioned
    * on the trigram so a probe prunes files — substring audits read
    * the index, never 100 TB of text. Fingerprint-keyed like the BM25
    * postings. */
  private val grepIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def grepIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(grepIndexPaths, s, d, fp, "graft_grep_idx") { p =>
      graft.sources.Sinks.writeRangePartitioned(
        operators.Retrieval.grepIndex(Tables.documents(s, d)), p, "g",
        partitions = 8)
    }
    s.read.parquet(path)
  }

  /** The driver's grep audit phrase (present in the synthetic corpus). */
  private val grepQuery = "batch stream"

  /** The driver's audit blocklist (first match by order wins; both
    * patterns occur in the corpus, some docs match both). */
  private val auditPatterns = Seq("batch stream", "dup")

  /** The driver's literal BM25 query set: one rare discriminative term
    * ('dup'), common-term conjunctions, and one out-of-vocabulary term
    * ('bloom') to exercise the miss path. */
  private val bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "dup scan", 1L -> "hash join merge",
    2L -> "stream window batch", 3L -> "slow filter bloom")

  private def bm25QueriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    bm25Queries.toDF("query_id", "query_text")
  }

  private def bm25QueryTermsLiteral: Seq[String] =
    bm25Queries.flatMap(_._2.split(" ")).distinct

  /** The driver's literal phrase set: a common bigram, a rarer trigram,
    * and an absent phrase to exercise the zero-match path (repeated
    * token included — the witness count must handle duplicate phrase
    * terms). */
  private val phraseQueries: Seq[(Long, String)] = Seq(
    0L -> "table hash", 1L -> "slow hash batch", 2L -> "bloom bloom")

  private def phraseQueriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    phraseQueries.toDF("query_id", "query_text")
  }

  private def phraseTermsLiteral: Seq[String] =
    phraseQueries.flatMap(_._2.split(" ")).distinct

  /** The same literal phrase set as a benchmark-phrase frame for the
    * verbatim decontamination pair (present + absent phrases exercise
    * both the flag and keep branches). */
  private def benchmarkPhrasesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    phraseQueries.toDF("phrase_id", "phrase_text")
  }

  /** Persisted positional postings (Retrieval.positionalIndex layout,
    * term-range-partitioned so a phrase probe prunes to its terms' row
    * groups) — the Lucene-style positional artifact, fingerprint-keyed
    * like the trigram/BM25 indexes. */
  private val posIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def posIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(posIndexPaths, s, d, fp, "graft_pos_idx") { p =>
      graft.sources.Sinks.writeRangePartitioned(
        operators.Retrieval.positionalIndex(Tables.documents(s, d)),
        p, "term", partitions = 8)
    }
    s.read.parquet(path)
  }

  /** Persisted count-min sketch partials — the mergeable
    * point-frequency artifact ([[operators.Sketches.cmsPartials]]):
    * depth×width exact counters, built once per documents data
    * version; any later term-frequency question reads the tiny frame,
    * never the corpus. Fingerprint-keyed like the HLL partials. */
  private val cmsIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def cmsIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(cmsIndexPaths, s, d, fp, "graft_cms_idx") { p =>
      operators.Sketches.cmsPartials(Tables.documents(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted per-source HLL sketch partials — the mergeable distinct-
    * count artifact ([[operators.Sketches]]); rollups union the blobs
    * with no corpus rescan. Fingerprint-keyed like the LM/BPE indexes. */
  private val sketchIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def sketchIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(sketchIndexPaths, s, d, fp, "graft_hll_idx") { p =>
      operators.Sketches.sketchPartials(Tables.documents(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted trained quality-classifier weights (the tiny model
    * artifact [[operators.Classifier.classifierTrain]] emits); serving
    * collects the d rows and applies them as plan literals. */
  private val clfIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def clfWeightsShared(s: SparkSession, d: String): Seq[Double] = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(clfIndexPaths, s, d, fp, "graft_clf_idx") { p =>
      val docs = Tables.documents(s, d)
      val labels = operators.TextAnalysis
        .gopherRules(docs, minWords = 20, minStopHits = 1)
        .select(col("doc_id"), col("keep").cast("double").as("label"))
      operators.Classifier.classifierTrain(docs, labels)
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path).orderBy("idx")
      .collect().map(_.getAs[Double]("weight")).toSeq
  }

  /** Persisted PCA model artifact (mean + top-k eigenpairs, ≤ k+1
    * tiny rows) — trained once per embeddings data version. */
  private val pcaIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def pcaModelShared(
      s: SparkSession, d: String): operators.Pca.PcaModel = {
    val fp = tableFingerprint(s, d, "embeddings.parquet")
    val path = artifactPath(pcaIndexPaths, s, d, fp, "graft_pca_idx") { p =>
      operators.Pca.pcaModelFrame(s,
          operators.Pca.pcaTrain(Tables.embeddings(s, d), k = 8))
        .write.mode("overwrite").parquet(p)
    }
    val model = operators.Pca.pcaModelFromFrame(s.read.parquet(path))
    pcaOracleModel = Some(model)
    model
  }

  /** The last PCA model served (set by [[pcaModelShared]]). DuckDB has
    * no eigensolver, but the PROJECTION from a trained model is just
    * list dot products — so [[oracleSql]] embeds this model's
    * mean/components as literals and q_embed_pca graduates to a FULL
    * oracle. Verify runs every query before dumping oracle_sql.json,
    * so the var is always populated on the driver path; if it is not
    * (oracleSql called standalone), the q_embed_pca key is omitted and
    * the driver records the weaker rows-only check. */
  @volatile private var pcaOracleModel: Option[operators.Pca.PcaModel] = None

  /** Persisted token-count histogram partials — the exact mergeable
    * quantile state ([[operators.Sketches.histPartials]]). */
  private val histIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def histIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(histIndexPaths, s, d, fp, "graft_histq_idx") { p =>
      operators.Sketches.histPartials(Tables.documents(s, d))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  private[graft] def bpeIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(bpeIndexPaths, s, d, fp, "graft_bpe_idx") { p =>
      val (_, seg) = operators.Bpe.bpeTrain(
        Tables.documents(s, d), nMerges = 12, vocabSize = 2000)
      operators.Bpe.segmentsIndex(seg).write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted unigram-LM tokenizer artifact (the [[bpeIndexShared]]
    * discipline): the slim (word, n_sub) Viterbi segment index, built
    * once per data version — serving never re-runs EM. */
  private val unigramIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def unigramIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(unigramIndexPaths, s, d, fp, "graft_unigram_idx") { p =>
      val (_, segs) = operators.Unigram.unigramTrain(Tables.documents(s, d))
      operators.Unigram.segmentsIndex(segs).write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Persisted WordPiece tokenizer artifact (the [[bpeIndexShared]]
    * discipline): the slim (word, n_sub) segment index from the
    * likelihood-gain merge loop, built once per data version. */
  private val wordpieceIndexPaths =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, String)]

  private[graft] def wordpieceIndexShared(s: SparkSession, d: String): DataFrame = {
    val fp = documentsFingerprint(s, d)
    val path = artifactPath(wordpieceIndexPaths, s, d, fp, "graft_wp_idx") { p =>
      val (_, seg) = operators.Wordpiece.wordpieceTrain(
        Tables.documents(s, d), nMerges = 12, vocabSize = 2000)
      operators.Bpe.segmentsIndex(seg).write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  private[graft] def duplicateLabelsShared(s: SparkSession, d: String): DataFrame = {
    minhashLabelsCache.keys
      .filter(_._1.sparkContext.isStopped)
      .foreach(minhashLabelsCache.remove)
    val fp = documentsFingerprint(s, d)
    minhashLabelsCache.get((s, d)) match {
      case Some((cachedFp, df)) if cachedFp == fp => df
      case stale =>
        stale.foreach(_._2.unpersist())
        val fresh = Dedup.duplicateLabels(minhashPairsShared(s, d)).persist()
        minhashLabelsCache.put((s, d), (fp, fresh))
        fresh
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Pricing.pricingSummary(Tables.lineitem(s, d))),
    "q_search_products" -> ((s, d) =>
      Catalog.searchProducts(Tables.part(s, d),
        nameContains = Some("red"), category = Some("ECONOMY"),
        minSize = Some(1), maxSize = Some(40),
        minPrice = Some(900.0), maxPrice = Some(1800.0),
        limit = 100, offset = 10)),
    "q_search_promo" -> ((s, d) =>
      Catalog.searchProducts(Tables.part(s, d),
        category = Some("ECONOMY"),
        li = Some(Tables.lineitem(s, d)), onPromo = Some(true), storeId = Some(5L),
        limit = 50)),
    // mcp.py:330–338: pick the bidirectional-containment best match
    // from the search results ("small ring" ⊂ "small ring deluxe")
    "q_search_best_match" -> ((s, d) =>
      Catalog.searchProducts(Tables.part(s, d),
        nameContains = Some("ring"), limit = 100,
        bestMatchFor = Some("small ring deluxe"))),
    // tables.sql:2,48 pg_trgm twin: typo-tolerant trigram ranking
    "q_fuzzy_search" -> ((s, d) =>
      Catalog.fuzzySearch(Tables.part(s, d), "smal ring", threshold = 0.3, limit = 15)),
    // the same search through the PERSISTED index probe path (GIN
    // analog): reads the gram-sorted parquet index from disk, so the
    // probe's `g IN (...)` prunes at the scan; bit-equal to
    // q_fuzzy_search, shares its oracle
    "q_fuzzy_search_indexed" -> ((s, d) =>
      Catalog.fuzzySearchIndexed(trigramIndexShared(s, d),
        "smal ring", threshold = 0.3, limit = 15)),
    // entity resolution: the dirty per-chain product feed resolved
    // against the canonical catalog — token-blocked candidates
    // (df-capped dictionary index, linear in the feed at fixed
    // catalog), exact integer levenshtein+Jaccard scoring, best match
    // per feed record. FULL oracle through the whole cascade
    // (levenshtein agrees integer-for-integer across engines)
    "q_entity_match" -> ((s, d) =>
      operators.Resolution.entityMatch(erFeed(s, d), erCatalog(s, d),
        minScoreMicro = 500000L, dfCap = 100, k = 1)),
    // the serving shape: the same match through the PERSISTED blocking
    // index (plan has no df-count aggregation — just the FileScan +
    // join); shares q_entity_match's oracle, bit-equal by construction
    "q_entity_match_indexed" -> ((s, d) =>
      operators.Resolution.entityMatchWithIndex(erFeed(s, d), erCatalog(s, d),
        erIndexShared(s, d), minScoreMicro = 500000L, k = 1)),
    // survivorship: rank-1 matches folded to one golden row per
    // canonical (match count + exact cent price bounds); unmatched
    // canonicals surface with n_matched = 0
    "q_entity_golden" -> ((s, d) =>
      operators.Resolution.goldenRecords(
        // the persisted rank-1 match artifact — survivorship folds it
        // instead of re-running the scoring cascade (which the bench
        // already measures as q_entity_match)
        erMatchShared(s, d),
        erFeed(s, d).select(col("feed_id"), col("price")),
        erCatalog(s, d))),
    // pre-flight occupancy meter for the blocking join (the
    // q_dedup_occupancy discipline): per-token posting size × feed
    // hits = the exact candidate mass each token contributes, BEFORE
    // a 100 TB feed pays the join. FULL oracle (the same df-capped
    // index + feed tokenization in SQL)
    "q_entity_occupancy" -> ((s, d) =>
      operators.Resolution.blockingOccupancy(
        erFeed(s, d), erIndexShared(s, d), minCandidates = 2L)),
    // the measured STREAMING gate: feed records resolve as they
    // arrive, per batch, against the static dictionary artifacts. The
    // per-record verdict never reads other feed records, so the union
    // of per-batch matches == the batch match and the entry shares
    // q_entity_match's FULL oracle
    "q_stream_entity_match" -> ((s, d) =>
      streaming.ResolutionStream.entityGateRun(s, d)),
    "q_price_compare" -> ((s, d) => Pricing.priceCompare(Tables.lineitem(s, d), comparedParts)),
    "q_product_card" -> ((s, d) =>
      Pricing.productCard(Tables.lineitem(s, d), Tables.supplier(s, d), historyPart)),
    "q_lowest_price_per_store" -> ((s, d) => Pricing.lowestPricePerStore(Tables.lineitem(s, d))),
    "q_lowest_price_category" -> ((s, d) =>
      Pricing.lowestPricePerStore(Tables.lineitem(s, d),
        part = Some(Tables.part(s, d)), category = Some("STANDARD"), rowLimit = Some(20))),
    "q_price_anomalies" -> ((s, d) =>
      Pricing.priceAnomalies(Tables.lineitem(s, d), sigma = 2.0)),
    "q_price_history" -> ((s, d) =>
      Pricing.priceHistory(Tables.lineitem(s, d), historyPart, "1996-01-01", "2001-12-31")),
    "q_price_trend" -> ((s, d) => Pricing.priceTrend(Tables.lineitem(s, d))),
    "q_best_basket" -> ((s, d) => Pricing.bestBasket(Tables.lineitem(s, d), basketParts)),
    "q_store_products" -> ((s, d) =>
      Catalog.storeProducts(Tables.lineitem(s, d), Tables.part(s, d), 7L, Some("ECONOMY"))),
    "q_store_products_search" -> ((s, d) =>
      Catalog.storeProducts(Tables.lineitem(s, d), Tables.part(s, d), 7L,
        category = None, search = Some("red"))),
    "q_store_lookup" -> ((s, d) =>
      Catalog.storeLookup(Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d),
        nameContains = Some("5"), cityContains = Some("1"))),
    "q_distinct_categories" -> ((s, d) => Catalog.distinctCategories(Tables.part(s, d))),
    "q_distinct_brands" -> ((s, d) => Catalog.distinctBrands(Tables.part(s, d))),
    "q_stats" -> ((s, d) => Catalog.stats(Tables.lineitem(s, d))),
    "q_stats_rollup" -> ((s, d) => Catalog.statsRollup(Tables.part(s, d))),
    "q_store_info" -> ((s, d) =>
      Catalog.storeInfo(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), 7L)),
    "q_store_dim" -> ((s, d) =>
      Catalog.storeDim(Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))),
    // Section B — ETL / transform stages
    "q_ingest_normalize" -> ((s, d) => Etl.normalizeEvents(Tables.events(s, d))),
    "q_profile_observations" -> ((s, d) =>
      Etl.profileColumns(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    // declarative data-quality constraint verification (the Deequ
    // posture) — ONE battery list drives both this run and the
    // generated oracle; the (l_orderkey, l_linenumber) uniqueness row
    // FAILS on the synthetic data by design (a verdict table where
    // every row passes never proves the violation counter works)
    "q_expectations" -> ((s, d) =>
      operators.Expectations.verify(
        Map("lineitem" -> Tables.lineitem(s, d), "orders" -> Tables.orders(s, d),
          "customer" -> Tables.customer(s, d), "part" -> Tables.part(s, d)),
        expectationChecks)),
    // INCREMENTAL data quality: the base load's verdict partials fold
    // with a late delta (5% of orders AND 5% of the part dimension —
    // the late parents RESOLVE fk orphans the base alone would
    // report) and serve whole-table verdicts with no base rescan; the
    // oracle is the FULL battery recompute, so the hash gate proves
    // incremental == full through serving
    "q_expectations_incremental" -> ((s, d) => {
      operators.Expectations.serveVerdicts(
        operators.Expectations.mergePartials(Seq(
          operators.Expectations.partials(expBaseTables(s, d), expectationChecks),
          operators.Expectations.partials(expDeltaTables(s, d), expectationChecks))),
        expectationChecks)
    }),
    // the SERVING split of the incremental form: base verdict
    // partials come from a fingerprint-keyed parquet ARTIFACT (the
    // rank/LM/BM25-index posture), kind-partitioned so each verdict
    // branch's kind filter PRUNES artifact files (the scalar branch
    // never opens the per-key partitions) — the plan folds tonight's
    // delta into the persisted state and never re-verifies the base
    // tables; the same full-battery oracle proves served == full
    "q_expectations_indexed" -> ((s, d) => {
      operators.Expectations.serveVerdictsSplit(
        expPartialsShared(s, d),
        operators.Expectations.partials(expDeltaTables(s, d), expectationChecks),
        expectationChecks)
    }),
    // STREAMING verdict maintenance (fifth DeltaLayout instance):
    // verdict partials are linear, so seed + per-batch counter deltas
    // serve whole-table verdicts mid-stream — hash-matching the SAME
    // full-battery oracle (stream == full, proven by the gate; a
    // mid-stream compaction runs inside the measured path)
    "q_stream_verdicts" -> ((s, d) =>
      graft.streaming.ExpectationsStream.verdictsMaintainRun(
        // a deterministic fifth of the orders (the
        // q_stream_expectations slice posture — the maintenance
        // machinery is fully exercised; the oracle carries the same
        // filter); dimensions ride whole
        s, Map(
          "lineitem" -> Tables.lineitem(s, d)
            .filter(col("l_orderkey") % 5 === 0)
            // stage/scan only what the battery reads
            .select("l_orderkey", "l_linenumber", "l_quantity",
              "l_discount", "l_partkey"),
          "orders" -> Tables.orders(s, d),
          "customer" -> Tables.customer(s, d), "part" -> Tables.part(s, d)),
        "lineitem", expectationChecks)),
    "q_dedup_exact" -> ((s, d) => Etl.dedupExactReplay(Tables.lineitem(s, d))),
    "q_latest_per_key" -> ((s, d) => Etl.latestPerKey(Tables.lineitem(s, d))),
    "q_scd_price_changes" -> ((s, d) => Etl.priceChanges(Tables.lineitem(s, d))),
    "q_sessionize" -> ((s, d) => Etl.sessionize(Tables.events(s, d))),
    "q_event_windows" -> ((s, d) => Etl.eventWindows(Tables.events(s, d))),
    "q_ingest_stores_xml" -> ((s, _) =>
      graft.sources.RawIngest.storesFromXml(s,
        "/root/reference/StoresFull7290700100008-000-000-20250821-002217")),
    // Section C — LLM-training-data operators
    "q_dedup_exact_docs" -> ((s, d) => Dedup.exactDocs(Tables.documents(s, d))),
    "q_dedup_minhash" -> ((s, d) => minhashPairsShared(s, d)),
    // band-bucket occupancy pre-flight: the quadratic-hot-spot meter a
    // 100 TB dedup run reads before the candidate self-join
    "q_dedup_occupancy" -> ((s, d) =>
      Dedup.minhashBucketOccupancy(Tables.documents(s, d))),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    // substring-level near-copy pairs (winnowed fingerprints): catches
    // a long verbatim passage shared between otherwise-different docs,
    // the mode whole-doc MinHash underweights
    "q_substring_dup" -> ((s, d) => Dedup.substringDupPairs(Tables.documents(s, d))),
    "q_dedup_calibration" -> ((s, d) => Dedup.minhashCalibration(Tables.documents(s, d))),
    // incremental mode: docs >= 400 arrive as a new batch and dedup
    // against the signature index of the existing corpus (doc_id < 400).
    // The computed index is localCheckpoint'd per the persistence
    // contract (sketched once for both consumers, GC-released).
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") >= 400),
        Dedup.minhashSignatures(docs.filter(col("doc_id") < 400)).localCheckpoint())
    }),
    "q_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d))),
    // Broder's CONTAINMENT next to resemblance: catches the
    // doc-inside-doc asymmetric duplication Jaccard structurally
    // misses; FULL oracle through the micro snaps
    "q_ngram_containment" -> ((s, d) =>
      Dedup.ngramContainment(Tables.documents(s, d))),
    "q_embed_topk" -> ((s, d) => Similarity.embedTopK(Tables.embeddings(s, d))),
    "q_embed_outliers" -> ((s, d) => Similarity.embedOutliers(Tables.embeddings(s, d))),
    "q_embed_lsh" -> ((s, d) => Similarity.embedLshBuckets(Tables.embeddings(s, d))),
    "q_embed_lsh_topk" -> ((s, d) => Similarity.embedLshTopK(Tables.embeddings(s, d))),
    "q_embed_ivf_topk" -> ((s, d) => Similarity.embedIvfTopK(Tables.embeddings(s, d))),
    "q_embed_sq_topk" -> ((s, d) => Similarity.embedSqTopK(Tables.embeddings(s, d))),
    "q_embed_ivf_sq_topk" -> ((s, d) => Similarity.embedIvfSqTopK(Tables.embeddings(s, d))),
    "q_embed_pq_topk" -> ((s, d) => Similarity.embedPqTopK(Tables.embeddings(s, d))),
    "q_embed_ivf_pq_topk" -> ((s, d) => Similarity.embedIvfPqTopK(Tables.embeddings(s, d))),
    // FAISS by_residual layout: codes quantize vn − cvec(list); the
    // dot-metric score decomposition keeps the LUT list-independent
    "q_embed_ivf_pq_residual" -> ((s, d) =>
      Similarity.embedIvfPqTopK(Tables.embeddings(s, d), residual = true)),
    // OPQ (Ge et al. 2013): learned variance-balancing rotation before
    // the subspace split — recall ≥ flat PQ at equal (m, nCodes) on
    // anisotropic corpora (spec-asserted on a planted one; flat stays
    // default because the testdata embeddings are isotropic)
    "q_embed_opq_topk" -> ((s, d) =>
      Similarity.embedOpqPqTopK(Tables.embeddings(s, d))),
    "q_embed_opq_indexed" -> ((s, d) => {
      val (codes, cents, rot) = opqIndexShared(s, d)
      Similarity.embedOpqPqTopKFromIndex(
        codes, cents, rot, Tables.embeddings(s, d))
    }),
    "q_embed_sq_topk_indexed" -> ((s, d) =>
      Similarity.embedSqTopKFromIndex(sqIndexShared(s, d), Tables.embeddings(s, d))),
    "q_embed_pq_topk_indexed" -> ((s, d) => {
      val (codes, cents) = pqIndexShared(s, d)
      Similarity.embedPqTopKFromIndex(codes, cents, Tables.embeddings(s, d))
    }),
    // IVF serving path: probe the persisted posting lists + centroid
    // table — no Lloyd pass or re-assignment in the plan
    "q_embed_ivf_topk_indexed" -> ((s, d) => {
      val (assign, cents) = ivfIndexShared(s, d)
      Similarity.embedIvfTopKFromIndex(assign, cents, Tables.embeddings(s, d))
    }),
    // the composed serving shapes: IVF posting lists × the SHARED
    // int8/PQ code artifacts, joined at serve time — the payoff of
    // flat (non-residual) fine codes
    "q_embed_ivf_sq_indexed" -> ((s, d) => {
      val (assign, cents) = ivfIndexShared(s, d)
      Similarity.embedIvfSqTopKFromIndex(
        assign, cents, sqIndexShared(s, d), Tables.embeddings(s, d))
    }),
    "q_embed_ivf_pq_indexed" -> ((s, d) => {
      val (assign, coarse) = ivfIndexShared(s, d)
      val (codes, cbooks) = pqIndexShared(s, d)
      Similarity.embedIvfPqTopKFromIndex(
        assign, coarse, codes, cbooks, Tables.embeddings(s, d))
    }),
    // the full index-family matrix; every trained family serves from
    // the PERSISTED artifacts (bit-equal to inline — no retraining in
    // the meter; lsh alone has nothing to train or persist)
    "q_ann_recall" -> ((s, d) =>
      Similarity.annRecall(Tables.embeddings(s, d),
        methods = annMeterMethods, impls = annServingImpls(s, d))),
    // ranking-quality deepening of q_ann_recall: MRR of the true NN +
    // NDCG@k per family, exact-integer micro discounts (rows-only by
    // declared design — the seven approximate rankings have no DuckDB
    // twin; formulas pinned vs an independent local computation in
    // LlmOpsSpec). Same persisted-artifact serving hooks as the
    // recall meter.
    "q_ann_metrics" -> ((s, d) =>
      Similarity.annMetrics(Tables.embeddings(s, d),
        methods = annMeterMethods, impls = annServingImpls(s, d))),
    // the nProbe sweep an IVF rollout reads to pick its operating
    // point: ONE trained index, |probes| bounded probe passes, exact
    // candidate accounting from the assignment's list sizes. Rows-only
    // (trained centroids are float sums with engine-unfixed partition
    // order); sweep arithmetic pinned vs a local recompute in spec
    "q_ann_tuning" -> ((s, d) =>
      Similarity.ivfTuning(Tables.embeddings(s, d))),
    // exploded checker-safe form (vec_id, dim, value) — all columns
    // atomic (the r7 driver checker crashed sorting the raw array
    // form), 6-decimal snap, FULL oracle via the literal-model SQL
    // [[pcaOracleModel]] feeds. Spectrum / orthonormality /
    // reconstruction invariants + artifact round-trip in PcaSpec;
    // projection serves from the persisted model artifact as plan
    // literals — one codegen dot per component.
    "q_embed_pca" -> ((s, d) =>
      operators.Pca.pcaProjectExploded(
        Tables.embeddings(s, d), pcaModelShared(s, d))),
    "q_embed_clusters" -> ((s, d) => Similarity.embedClusterStats(Tables.embeddings(s, d))),
    // SemDeDup: k-means-sharded semantic dedup (the paper's cluster
    // device — within-cluster pairs only; the LSH-banded
    // q_embed_neardup is the other bounding discipline). k scales
    // with the corpus (cluster size ~250, the paper's k ∝ n
    // contract) so pair mass stays linear at any SF. Rows-only for
    // the q_embed_clusters reason (trained centroids); the
    // within-cluster semantics and the cross-cluster-miss limitation
    // are pinned in spec
    "q_semdedup" -> ((s, d) =>
      Similarity.semDeDup(Tables.embeddings(s, d), tau = 0.35)),
    // the SERVING shape: the same verdict from the persisted slim
    // (vec_id, cid, sim) assignment artifact — no Lloyd training, no
    // n·k assignment scan in the plan; bit-equal to inline (spec)
    "q_semdedup_indexed" -> ((s, d) =>
      Similarity.semDeDupFromIndex(
        Tables.embeddings(s, d), sdAssignShared(s, d), tau = 0.35)),
    "q_cluster_quality" -> ((s, d) =>
      Similarity.clusterQuality(Tables.embeddings(s, d), Tables.documents(s, d))),
    "q_chunk_dedup" -> ((s, d) => Dedup.chunkDedup(Tables.documents(s, d))),
    "q_span_dedup" -> ((s, d) => Dedup.spanDedup(Tables.documents(s, d))),
    // EXACT duplicated-substring spans over ALL overlapping windows
    // (the Lee et al. ExactSubstr face — catches the one-token-shifted
    // duplicates spanDedup's grid misses); FULL oracle through the
    // window-hash + island-merge cascade
    "q_exact_substrings" -> ((s, d) =>
      Dedup.exactSubstringSpans(Tables.documents(s, d))),
    // the transform half: cut duplicated runs from all but the owning
    // occurrence (owner protection where windows overlap), rebuild the
    // text; FULL oracle
    "q_exact_substring_clean" -> ((s, d) =>
      Dedup.exactSubstringClean(Tables.documents(s, d))),
    // the incremental face: odd doc_ids arrive as the batch, probe the
    // PERSISTED window-hash index over the even seed — the oracle is
    // the full-corpus spans SQL restricted to the batch, so the hash
    // gate proves incremental == full THROUGH the serving path
    "q_exact_substring_incremental" -> ((s, d) =>
      Dedup.exactSubstringSpansAgainst(
        Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0),
        esIndexShared(s, d))),
    "q_dup_provenance" -> ((s, d) => Dedup.dupProvenance(Tables.documents(s, d))),
    // two synthetic corpus versions carved from one table, scale-
    // proportional at every SF: 1/20 of docs added, 1/20 removed, 1/20
    // content-changed, the rest unchanged
    "q_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Etl.snapshotDiff(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 =!= 1)
          .withColumn("text", when(col("doc_id") % 20 === 2,
            concat(col("text"), lit(" rev2"))).otherwise(col("text"))))
    }),
    // incremental rollup maintenance: prev is a deterministic variant
    // of the snapshot (missing docs → added, " rev1" texts → changed,
    // "xx" langs → metadata-only group move, shifted ids → removed);
    // the merged result must EXACTLY equal the direct rollup over the
    // current snapshot — the oracle recomputes directly, so the hash
    // gate proves incremental == full
    "q_rollup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 2,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))
        .withColumn("lang", when(col("doc_id") % 20 === 3,
          lit("xx")).otherwise(col("lang")))
        .unionByName(docs.filter(col("doc_id") % 20 === 4)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      Etl.rollupIncremental(Etl.corpusRollup(prev), prev, docs)
    }),
    "q_tfidf_topterms" -> ((s, d) => TextAnalysis.tfidfTopTerms(Tables.documents(s, d))),
    "q_top_terms" -> ((s, d) => TextAnalysis.topTerms(Tables.documents(s, d))),
    "q_collocations" -> ((s, d) => TextAnalysis.collocations(Tables.documents(s, d))),
    "q_corpus_stats" -> ((s, d) => TextAnalysis.corpusStats(Tables.documents(s, d))),
    // rows-only by declared design (DataSketches HLL estimates have no
    // DuckDB twin); error bounds + artifact-serve equality asserted in
    // SkewAndApproxSpec. Serves from the persisted sketch partials —
    // the rollup plan unions tiny blobs, no corpus scan.
    "q_sketch_rollup" -> ((s, d) =>
      operators.Sketches.sketchRollup(sketchIndexShared(s, d))),
    // pairwise source-overlap matrix by HLL inclusion–exclusion over
    // the SAME persisted partials (rows-only for the q_sketch_rollup
    // reason; tracks exact intersections within tolerance in spec)
    "q_source_overlap" -> ((s, d) =>
      operators.Sketches.sketchOverlap(sketchIndexShared(s, d))),
    // quantile rollup from the persisted EXACT histogram partials —
    // integer-rational ranks, so the merged quantiles hash-match the
    // direct recompute (the oracle): merge == full, proven per row
    "q_quantile_rollup" -> ((s, d) =>
      operators.Sketches.histQuantiles(histIndexShared(s, d))),
    // count-min sketch partials served from the persisted artifact —
    // md5-prefix row hashes make bucket assignment (and therefore the
    // whole counter table) engine-reproducible: a sketch with a FULL
    // DuckDB oracle
    "q_cms_build" -> ((s, d) => cmsIndexShared(s, d).orderBy("d", "bucket")),
    // fidelity report: every corpus term's exact count vs the sketch
    // estimate from the artifact; est >= exact always (CMS contract),
    // and the deterministic estimator means even `est` oracle-matches
    "q_cms_estimate" -> ((s, d) =>
      operators.Sketches.cmsCalibration(
        Tables.documents(s, d), cmsIndexShared(s, d))),
    // STREAMING index maintenance proven through the serving path:
    // seed index from even doc_ids, stream the odd half as per-batch
    // delta partitions (retried batches overwrite their own partition),
    // then serve the driver's query set from seed ∪ deltas — the
    // oracle is the SAME full-corpus BM25 SQL as q_bm25_search
    "q_stream_bm25" -> ((s, d) =>
      graft.streaming.Bm25Stream.searchMaintainRun(
        s, d, bm25QueriesDf(s), bm25QueryTermsLiteral)),
    // REMOVAL-AWARE index maintenance — the deletion lifecycle
    // extended beyond the graph family to retrieval (the reference's
    // upserts REPLACE rows and its deletes cascade): the seed index
    // holds yesterday's corpus (a third verbatim, a third with STALE
    // text, an alien slice deleted today); the stream delivers adds
    // (new + replacing, last-writer-wins) and removals BY ID, compacts
    // mid-lifecycle, serves — hash-matching the SAME full-corpus BM25
    // oracle as q_bm25_search (signed stream == full rebuild over the
    // surviving corpus; removals subtract from df, idf, AND avgdl)
    "q_stream_bm25_signed" -> ((s, d) =>
      graft.streaming.Bm25SignedStream.searchMaintainRun(
        s, d, bm25QueriesDf(s), bm25QueryTermsLiteral)),
    // STREAMING sketch maintenance (the third DeltaLayout instance,
    // after the rollup and the inverted index): seed counters from
    // even doc_ids, stream the odd half as per-batch counter deltas,
    // COMPACT inside the measured path, serve seed ∪ deltas — CMS
    // counters are linear, so the served table hash-matches the SAME
    // direct full-corpus oracle as q_cms_build (stream-maintained ==
    // direct-built, proven by the hash gate)
    "q_stream_cms" -> ((s, d) =>
      graft.streaming.CmsStream.cmsMaintainRun(s, d)),
    // STREAMING vector-index maintenance (the fourth DeltaLayout
    // instance): centroids train once on the even-id seed, odd ids
    // stream through assignment-only maintenance (a narrow broadcast
    // map per batch — the FAISS add-after-train contract), compaction
    // runs inside the measured path, and the served top-k equals the
    // direct one-batch assignment twin (assignment at fixed centroids
    // is deterministic; rows-only — equality proven through serving
    // in spec, like the other ANN families)
    "q_stream_ivf" -> ((s, d) =>
      graft.streaming.IvfStream.ivfMaintainRun(s, d)),
    // REMOVAL-AWARE vector-index maintenance: the SignedIndexLayout
    // machine's third instantiation (BM25, phrase, now ANN) — a
    // document deleted upstream must leave the ANN index too. Adds
    // of existing ids are RE-EMBEDS (new vector → new list), removes
    // delete by id, centroids stay train-once fixed and ride the
    // compaction swap verbatim. rows-only for the q_stream_ivf
    // reason; signed == direct-assignment-of-surviving-corpus
    // equality proven through serving in spec
    "q_stream_ivf_signed" -> ((s, d) =>
      graft.streaming.IvfSignedStream.ivfMaintainRun(s, d)),
    // STREAMING SemDeDup — the semantic-dedup verdict maintained
    // while embeddings arrive, completing the SemDeDup lifecycle
    // (batch / incremental / streaming): centroids train once on the
    // even-id seed, odd ids stream through assignment-only
    // maintenance, compaction refreshes the persisted verdict
    // mid-path, and serving re-resolves ONLY delta-touched clusters
    // (components never cross cluster boundaries — the paper's own
    // sharding device). rows-only for the q_semdedup reason; served
    // == direct full-corpus twin spec-asserted
    "q_stream_semdedup" -> ((s, d) =>
      graft.streaming.SemDedupStream.semDedupMaintainRun(s, d)),
    // REMOVAL-AWARE SemDeDup assignment — the SignedIndexLayout
    // machine for the persisted (vec_id, cid, sim) artifact: a
    // deleted document's vector stops seeding keep/drop verdicts
    // (without it, a cluster's survivor can be a vector whose doc no
    // longer exists while every other member stays wrongly dropped).
    // Adds re-embed (new vector → possibly new cluster), removes
    // delete by id, centroids stay train-once fixed across the
    // compaction swap. rows-only for the q_semdedup reason; live
    // assignment == direct assignment of survivors and served
    // verdict == direct twin spec-pinned
    "q_stream_semdedup_signed" -> ((s, d) =>
      graft.streaming.SemDedupSignedStream.semDedupMaintainRun(s, d)),
    "q_vocab_stats" -> ((s, d) => TextAnalysis.vocabStats(Tables.documents(s, d))),
    "q_source_divergence" -> ((s, d) =>
      TextAnalysis.sourceDivergence(Tables.documents(s, d))),
    "q_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitterTerms(Tables.documents(s, d))),
    "q_domain_stats" -> ((s, d) =>
      TextCleaning.domainStats(TextCleaning.withSyntheticUrls(Tables.documents(s, d)))),
    "q_url_dedup" -> ((s, d) =>
      TextCleaning.urlDedup(TextCleaning.withSyntheticDupUrls(Tables.documents(s, d)))),
    "q_lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "q_quality_score" -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "q_token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "q_doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(Tables.documents(s, d))),
    "q_perplexity" -> ((s, d) => TextAnalysis.perplexityScore(Tables.documents(s, d))),
    // serving path: score against the persisted LM artifact — no
    // corpus re-aggregation in the plan, just the read + join
    "q_perplexity_indexed" -> ((s, d) =>
      TextAnalysis.perplexityAgainst(Tables.documents(s, d), lmIndexShared(s, d))),
    "q_perplexity_bigram" -> ((s, d) =>
      TextAnalysis.bigramPerplexity(Tables.documents(s, d))),
    "q_perplexity_trigram" -> ((s, d) =>
      TextAnalysis.trigramPerplexity(Tables.documents(s, d))),
    "q_perplexity_kn" -> ((s, d) =>
      TextAnalysis.knPerplexity(Tables.documents(s, d))),
    // trigram interpolated KN: the full KenLM model shape — raw
    // counts at the top order, continuation type counts below
    "q_perplexity_kn3" -> ((s, d) =>
      TextAnalysis.knTrigramPerplexity(Tables.documents(s, d))),
    // HELD-OUT KN evaluation: train on 80% of docs, score the 20%
    // holdout — the split that makes the unseen-bigram,
    // unseen-history, and unseen-continuation fallbacks LIVE (every
    // self-scored entry sees only observed statistics), each proven
    // by the full oracle's matching CASE cascade
    "q_kn_holdout" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.knAgainst(
        docs.filter(col("doc_id") % 5 === 0),
        TextAnalysis.knModel(docs.filter(col("doc_id") % 5 =!= 0)))
    }),
    // the same held-out proof one order up: the trigram cascade's
    // level fallbacks go live and the oracle mirrors every branch
    "q_kn3_holdout" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.knTrigramAgainst(
        docs.filter(col("doc_id") % 5 === 0),
        TextAnalysis.kn3Model(docs.filter(col("doc_id") % 5 =!= 0)))
    }),
    // modified KN: per-count-class discounts estimated from n1..n4
    // driver-side (bounded row), riding the plan as literals; the
    // indexed form serves from the SAME knModel artifact as plain KN
    "q_perplexity_mkn" -> ((s, d) =>
      TextAnalysis.mknPerplexity(Tables.documents(s, d))),
    "q_perplexity_mkn_indexed" -> ((s, d) =>
      TextAnalysis.mknAgainst(Tables.documents(s, d), knIndexShared(s, d))),
    // serving path: score against the persisted KN type-table artifact
    // — model statistics re-derive from the slim artifact, never a
    // corpus re-aggregation; bit-equal to the self-trained form, so
    // the SAME full oracle proves the serving path
    "q_perplexity_kn_indexed" -> ((s, d) =>
      TextAnalysis.knAgainst(Tables.documents(s, d), knIndexShared(s, d))),
    // incremental LM maintenance proven THROUGH serving: prior model
    // trained on the mutated half-stale corpus (the
    // q_phrase_incremental recipe), signed count deltas folded in,
    // corpus scored against the maintained artifact — the oracle is
    // the SAME full-corpus KN SQL, so the hash gate proves
    // incremental == full retrain
    "q_kn_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 2,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 20 === 4)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val maintained = TextAnalysis.knModelIncremental(
        TextAnalysis.knModel(prev), prev, docs)
      TextAnalysis.knAgainst(docs, maintained)
    }),
    "q_ccnet_buckets" -> ((s, d) => TextAnalysis.ccnetBuckets(Tables.documents(s, d))),
    "q_repetition" -> ((s, d) => TextAnalysis.repetitionScore(Tables.documents(s, d))),
    // relaxed thresholds (minWords/minStopHits) so the synthetic corpus
    // exercises both keep and drop; defaults are the paper's canonical
    "q_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules(Tables.documents(s, d), minWords = 20, minStopHits = 1)),
    // uniformly keep=false on the punctuation-free synthetic corpus
    // (documented in the scaladoc); the rules fire on planted docs in spec
    "q_c4_rules" -> ((s, d) => TextAnalysis.c4Rules(Tables.documents(s, d))),
    "q_classifier_score" -> ((s, d) => TextAnalysis.classifierScore(Tables.documents(s, d))),
    // rows-only by declared design: IRLS moment sums are double
    // accumulations with engine-unfixed partition order (weights
    // reproducible to float-sum tolerance, pinned vs an independent
    // local IRLS in ClassifierSpec at 1e-6)
    "q_classifier_train" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherRules(docs, minWords = 20, minStopHits = 1)
        .select(col("doc_id"), col("keep").cast("double").as("label"))
      operators.Classifier.classifierTrain(docs, labels)
    }),
    // serving path: the persisted trained weights ride the plan as
    // LITERALS — no training stage, no join, no broadcast (plan-locked)
    "q_classifier_apply" -> ((s, d) =>
      operators.Classifier.classifierApply(
        Tables.documents(s, d), clfWeightsShared(s, d))),
    // multinomial NB domain classifier (the unbounded-vocab sparse
    // complement to IRLS): src0+src1 play the target domain, the
    // q_dsir_weights setup. Integer micro-nat weights -> exact integer
    // document scores -> full DuckDB oracle for BOTH train and score.
    "q_nb_train" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Classifier.nbTrain(docs, nbDomainLabels(docs))
    }),
    "q_nb_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Classifier.nbScore(docs,
        operators.Classifier.nbTrain(docs, nbDomainLabels(docs)))
    }),
    // EXACT eval report for the NB classifier vs its training labels
    // (resubstitution fidelity): confusion counts, precision/recall/F1,
    // and histogram-exact mid-rank AUC — integer micro snaps end to
    // end, so the whole report has a DuckDB oracle twin
    "q_nb_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = nbDomainLabels(docs)
      val scored = operators.Classifier
        .nbScore(docs, operators.Classifier.nbTrain(docs, labels))
        .join(labels.select(col("doc_id"), col("label").as("y")), Seq("doc_id"))
        .select("doc_id", "score_micro", "y")
      operators.Classifier.classifierEval(scored)
    }),
    // the probability-quality companion to q_nb_eval: reliability bins
    // + ECE over the same resubstitution scores; FULL oracle (the bin
    // boundaries are the same long literals in both engines)
    "q_classifier_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = nbDomainLabels(docs)
      val scored = operators.Classifier
        .nbScore(docs, operators.Classifier.nbTrain(docs, labels))
        .join(labels.select(col("doc_id"), col("label").as("y")), Seq("doc_id"))
        .select("doc_id", "score_micro", "y")
      operators.Classifier.calibrationReport(scored)
    }),
    // incremental NB maintenance proven THROUGH serving: prior model
    // trained on the mutated half-stale corpus (the q_kn_incremental
    // recipe), signed per-class count deltas folded in — including a
    // LABEL FLIP with unchanged text (doc_id % 20 == 6 swaps domain),
    // which the (text, label) joint diff must catch — then the corpus
    // is scored against the maintained model. The oracle is the SAME
    // full-corpus NB SQL as q_nb_score, so the hash gate proves
    // incremental == full retrain.
    "q_nb_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 2,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))
        .withColumn("source", when(col("doc_id") % 20 === 6,
          when(col("source") === "src0", lit("src2")).otherwise(lit("src0")))
          .otherwise(col("source")))
        .unionByName(docs.filter(col("doc_id") % 20 === 4)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val maintained = operators.Classifier.nbModelIncremental(
        operators.Classifier.nbTrain(prev, nbDomainLabels(prev)),
        prev, nbDomainLabels(prev), docs, nbDomainLabels(docs))
      operators.Classifier.nbScore(docs, maintained)
    }),
    // streaming NB maintenance (the DeltaLayout pattern on per-class
    // term counts): even doc_ids seed, odd ones stream, a mid-stream
    // compaction runs inside the measured path, and serving the WHOLE
    // corpus from the maintained counts hash-matches the same
    // direct-train oracle as q_nb_score — counts are linear, so
    // stream-maintained == direct, exactly
    "q_stream_nb" -> ((s, d) => streaming.NbStream.nbMaintainRun(s, d)),
    // Okapi BM25 ranked retrieval: integer micro contributions -> exact
    // integer document scores -> full DuckDB oracle through the whole
    // idf/tf-normalization cascade; ranks via the bounded graft_topk
    "q_bm25_search" -> ((s, d) =>
      operators.Retrieval.bm25Search(Tables.documents(s, d), bm25QueriesDf(s))),
    // serving path: score from the persisted term-sorted postings +
    // meta artifacts — the query's term IN (...) filter pushes to the
    // postings scan (plan-locked); same oracle as the online form
    "q_bm25_indexed" -> ((s, d) => {
      val (p, m) = bm25IndexShared(s, d)
      operators.Retrieval.bm25FromIndex(p, m, bm25QueriesDf(s), bm25QueryTermsLiteral)
    }),
    // lexical + semantic hybrid retrieval fused by reciprocal-rank
    // fusion — exact integer RRF scores, full oracle across both
    // branches and the fusion
    "q_hybrid_search" -> ((s, d) =>
      operators.Retrieval.hybridSearch(
        Tables.documents(s, d), Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L))),
    // corpus substring audit: online full scan vs the persisted
    // trigram-postings probe (candidates must cover EVERY query
    // trigram, then one contains() verify) — bit-equal, shared oracle
    "q_grep" -> ((s, d) =>
      operators.Retrieval.grepSearch(Tables.documents(s, d), grepQuery)),
    "q_grep_indexed" -> ((s, d) =>
      operators.Retrieval.grepFromIndex(
        grepIndexShared(s, d), Tables.documents(s, d), grepQuery)),
    // exact phrase search over positional postings (the relational
    // phrase join: one probe join + one witness-count aggregation for
    // any number of phrases) — the verbatim-sequence probe
    // decontamination and quote tracing need; full oracle twin, and
    // the indexed form's term IN (...) probe pushes to the
    // term-range-partitioned positional artifact (plan-locked)
    "q_phrase_search" -> ((s, d) =>
      operators.Retrieval.phraseSearch(
        Tables.documents(s, d), phraseQueriesDf(s))),
    "q_phrase_indexed" -> ((s, d) =>
      operators.Retrieval.phraseFromIndex(
        posIndexShared(s, d), phraseQueriesDf(s),
        queryTermsLiteral = phraseTermsLiteral)),
    // incremental positional maintenance proven THROUGH serving: prior
    // index built on the mutated half-stale corpus (the
    // q_bm25_incremental recipe), deltas folded in, phrase search
    // served from the maintained artifact — the oracle is the SAME
    // full-corpus phrase SQL, so the hash gate proves incremental ==
    // full rebuild
    "q_phrase_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 2,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 20 === 4)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val maintained = operators.Retrieval.positionalIndexIncremental(
        operators.Retrieval.positionalIndex(prev), prev, docs)
      operators.Retrieval.phraseFromIndex(maintained, phraseQueriesDf(s))
    }),
    // measured STREAMING positional maintenance (the Bm25Stream layout
    // minus the meta frame): seed from half the corpus, stream the
    // rest, serve phrase search from seed ∪ deltas — hash-matches the
    // same full-corpus phrase oracle
    "q_stream_phrase" -> ((s, d) =>
      streaming.PhraseStream.searchMaintainRun(
        s, d, phraseQueriesDf(s), phraseTermsLiteral)),
    // REMOVAL-AWARE positional maintenance: the signed BM25 posture
    // on the phrase index, riding the SAME SignedIndexLayout state
    // machine (add/REPLACE/remove-by-id, last-writer-wins) — a
    // replaced doc serves its new positions, a removed doc's phrases
    // stop matching. Same full-corpus phrase oracle over the
    // surviving corpus: the hash gate IS the proof
    "q_stream_phrase_signed" -> ((s, d) =>
      streaming.PhraseSignedStream.searchMaintainRun(
        s, d, phraseQueriesDf(s), phraseTermsLiteral)),
    // verbatim-sequence decontamination: per-doc contains-the-exact-
    // benchmark-phrase verdict — the fifth face of the decontamination
    // matrix, full oracle; the indexed form probes the persisted
    // positional artifact with the phrase terms pushed
    "q_decontaminate_phrase" -> ((s, d) =>
      operators.Retrieval.decontaminatePhrase(
        Tables.documents(s, d), benchmarkPhrasesDf(s))),
    "q_decontaminate_phrase_indexed" -> ((s, d) =>
      operators.Retrieval.decontaminatePhraseFromIndex(
        posIndexShared(s, d), Tables.documents(s, d), benchmarkPhrasesDf(s),
        phraseTermsLiteral = phraseTermsLiteral)),
    // measured STREAMING twin: the verdict is per-doc local, so the
    // per-micro-batch union is exactly the whole-corpus scan — same
    // full oracle
    "q_stream_phrase_gate" -> ((s, d) =>
      streaming.CurationStream.phraseGateRun(s, d, phraseQueries)),
    // blocklist scan: first matching audit pattern per doc — the
    // stateless projection shared verbatim with the streaming gate
    "q_audit_scan" -> ((s, d) =>
      operators.Retrieval.auditScan(Tables.documents(s, d), auditPatterns)
        .orderBy("doc_id")),
    // the measured STREAMING face: every arriving doc reports its
    // match before landing; stateless ⇒ row-identical to the batch
    // scan, same oracle
    "q_stream_audit_gate" -> ((s, d) =>
      graft.streaming.CurationStream.auditGateRun(s, d, auditPatterns)),
    // the measured STREAMING data-quality gate: every arriving fact
    // row reports which declared constraints it violates before
    // landing (per-row checks are projections; the referential check
    // is a stream-static broadcast join) — stateless ⇒ row-identical
    // to the batch scan, FULL oracle from the same battery
    "q_stream_expectations" -> ((s, d) =>
      graft.streaming.ExpectationsStream.gateRun(
        // stage only the columns the battery reads (the harness
        // writes the staged source, so width is real cost) and a
        // deterministic fifth of the orders — the gate is per-row
        // stateless, so the slice exercises it fully
        s, Tables.lineitem(s, d).filter(col("l_orderkey") % 5 === 0).select(
          "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_partkey"),
        Map("part" -> Tables.part(s, d)),
        Seq("l_orderkey", "l_linenumber"), rowGateChecks)),
    // incremental index maintenance proven THROUGH the serving path:
    // prior index built on a mutated half-stale corpus (the
    // q_rollup_incremental recipe — adds, edits, a group move, and
    // extra docs that get removed), deltas folded in, then BM25 served
    // from the maintained index — the oracle is the SAME full-corpus
    // BM25 SQL, so the hash gate proves incremental == full rebuild
    "q_bm25_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 2,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 20 === 4)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val (pp, pm) = operators.Retrieval.bm25Index(prev)
      val (ip, im) = operators.Retrieval.bm25IndexIncremental(pp, pm, prev, docs)
      operators.Retrieval.bm25FromIndex(
        ip, im, bm25QueriesDf(s), bm25QueryTermsLiteral)
    }),
    // MMR diverse selection over the embedding corpus (rows-only: the
    // greedy refinement runs on the bounded pool; pinned against an
    // independent local MMR in spec)
    "q_mmr_select" -> ((s, d) =>
      operators.Retrieval.mmrSelect(
        Tables.embeddings(s, d), queryId = 0L, k = 10, lambda = 0.7,
        poolSize = 64)),
    // contrastive hard-negative mining: most-similar non-near-dup
    // vectors per query — snapped cosines make the ceiling and the
    // ranking engine-exact, full oracle
    "q_hard_negatives" -> ((s, d) =>
      operators.Retrieval.hardNegatives(
        Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L), k = 10, dupCos = 0.8)),
    // tokenizer fertility comparison across the three subword families
    // (BPE / unigram-LM / WordPiece — the production matrix), all
    // serving from their persisted artifacts (rows-only: the
    // tokenizers are)
    "q_tokenizer_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Bpe.fertilityStats(Seq(
        "bpe" -> Bpe.tokenizeWithIndex(docs, bpeIndexShared(s, d))
          .withColumnRenamed("n_bpe_tokens", "n_pieces"),
        "unigram" -> Bpe.tokenizeWithIndex(docs, unigramIndexShared(s, d))
          .withColumnRenamed("n_bpe_tokens", "n_pieces"),
        "wordpiece" -> operators.Wordpiece.tokenizeWithIndex(
          docs, wordpieceIndexShared(s, d))))
    }),
    // BPE subword tokenizer: merges learned from the bounded word-count
    // table (never the corpus), applied via a segmentation join.
    // rows-only: the greedy merge loop has no SQL twin; an independent
    // reference implementation pins the merge sequence in spec
    "q_bpe_train" -> ((s, d) =>
      Bpe.bpeMerges(Tables.documents(s, d), nMerges = 12, vocabSize = 2000)),
    "q_bpe_tokenize" -> ((s, d) => {
      val (_, seg) = Bpe.bpeTrain(Tables.documents(s, d), nMerges = 12, vocabSize = 2000)
      Bpe.bpeTokenize(Tables.documents(s, d), seg)
    }),
    // the serving path: tokenize from the persisted vocabSize-row
    // artifact — no merge loop in the plan, just the read + join
    "q_bpe_tokenize_indexed" -> ((s, d) =>
      Bpe.tokenizeWithIndex(Tables.documents(s, d), bpeIndexShared(s, d))),
    // WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) — BPE's
    // merge loop under the likelihood-gain objective count(ab)/
    // (count(a)·count(b)) compared as exact integer pico quotients,
    // "##" continuation pieces, [UNK] OOV. rows-only: the greedy loop
    // has no SQL twin; an independent reference implementation pins
    // the merge sequence in spec
    "q_wordpiece_train" -> ((s, d) =>
      operators.Wordpiece.wordpieceMerges(
        Tables.documents(s, d), nMerges = 12, vocabSize = 2000)),
    "q_wordpiece_tokenize" -> ((s, d) => {
      val (_, seg) = operators.Wordpiece.wordpieceTrain(
        Tables.documents(s, d), nMerges = 12, vocabSize = 2000)
      operators.Wordpiece.wordpieceTokenize(Tables.documents(s, d), seg)
    }),
    // serving path: tokenize from the persisted (word, n_sub) artifact
    // — no merge loop in the plan, just the read + join
    "q_wordpiece_tokenize_indexed" -> ((s, d) =>
      operators.Wordpiece.tokenizeWithIndex(
        Tables.documents(s, d), wordpieceIndexShared(s, d))),
    // unigram-LM (SentencePiece-style) subword tokenizer — the other
    // standard subword vocabulary next to BPE. rows-only: soft EM has
    // no SQL twin; an independent local forward-backward pins expected
    // counts at 1e-9 and the integer-cost Viterbi is pinned exactly
    // (UnigramSpec)
    "q_unigram_train" -> ((s, d) =>
      operators.Unigram.unigramModel(Tables.documents(s, d))),
    "q_unigram_tokenize" -> ((s, d) => {
      val (_, segs) = operators.Unigram.unigramTrain(Tables.documents(s, d))
      operators.Unigram.unigramTokenize(Tables.documents(s, d), segs)
    }),
    // serving path: tokenize from the persisted (word, n_sub) artifact
    // — no EM, the Bpe.tokenizeWithIndex join against the unigram index
    "q_unigram_tokenize_indexed" -> ((s, d) =>
      Bpe.tokenizeWithIndex(Tables.documents(s, d), unigramIndexShared(s, d))
        .withColumnRenamed("n_bpe_tokens", "n_pieces")),
    // oracle-checkable manifest projection: media identity, byte size,
    // the cross-engine md5 checksum, and the decode verdict. Decode
    // STATISTICS (pixel/audio features) stay spec-only — DuckDB cannot
    // decode — but identity, sizing, and the codec column are exact.
    "q_multimodal_features" -> ((s, d) =>
      graft.sources.Multimodal.extractFeatures(
        graft.sources.Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("checksum_md5").as("checksum"), col("codec"))
        .orderBy("media_id")),
    // IMAGE near-dup over REAL decoded pixels: every doc renders a
    // deterministic 32×32 PNG, every 50th plants a perceptual twin
    // (BMP re-encode or 2× pixel-replicated upscale — different
    // BYTES, so exact/url dedup can't see them); aHash/dHash grids +
    // the text SimHash hamming-bucket machinery catch them with no
    // all-pairs join. Both faces serve from the PERSISTED fingerprint
    // artifact (render+decode once per data version — imageFpShared);
    // rows-only (DuckDB cannot decode PNGs); fingerprint invariants
    // and planted-twin capture spec-pinned
    "q_image_neardup" -> ((s, d) =>
      graft.sources.Multimodal.imageNearDup(
        imageFpShared(s, d), maxHamming = 6, bucketCap = 1000L)),
    // the survivors face over the same corpus: pair components via
    // star contraction, min media_id survives — one verdict row per
    // image (planted twins all report kept=false, spec-pinned).
    // rows-only for the q_image_neardup reason
    "q_image_survivors" -> ((s, d) =>
      graft.sources.Multimodal.imageNearDupSurvivors(
        imageFpShared(s, d), maxHamming = 6, bucketCap = 1000L)),
    // STREAMING image ingest gate — completes multimodal dedup's
    // lifecycle column: arriving images fingerprint in-batch (narrow
    // decode, payloads never shuffle) and probe the persisted dHash
    // chunk-bucket index; the corpus is never re-decoded. Every
    // planted twin matches its original at hamming 0 without
    // exact-hash help. rows-only for the q_image_neardup reason;
    // stream == batch operator equality spec-pinned
    "q_stream_image_gate" -> ((s, d) =>
      streaming.ImageStream.imageGateRun(s, d)),
    // REMOVAL-AWARE image fingerprint index — the SignedIndexLayout
    // machine for the multimodal family, completing its deletion
    // column: removes delete by media_id, adds decode in-batch
    // (payloads never shuffle, never persist), and the gate then
    // proves the contract — twins of REMOVED originals emit no pairs
    // (deleted content re-admits instead of being suppressed by its
    // ghost), twins of surviving ones still match at hamming 0.
    // rows-only (DuckDB cannot decode PNGs); live-face equality vs
    // direct fingerprints of the survivors spec-pinned
    "q_stream_image_signed" -> ((s, d) =>
      streaming.ImageSignedStream.imageMaintainRun(s, d)),
    // the cross-family deletion contract all per-family signed
    // machines compose into (the reference's ON DELETE CASCADE,
    // rabbitmq-to-postgres/app.py:98): ONE victim set streamed as
    // removals through all five machines, then a presence probe of
    // every live face — (family, rows_before, rows_after) with
    // rows_after 0 across BM25, phrase, both dedup signature faces,
    // IVF, and the image index. rows-only (sketch/image faces have
    // no SQL twin); before>0 ∧ after==0 spec-pinned
    "q_signed_delete_cascade" -> ((s, d) =>
      streaming.SignedDeleteCascade.deleteCascadeRun(s, d)),
    // Section A+ — purchase-log analytics (multi-way join rollups)
    "q_revenue_by_nation" -> ((s, d) =>
      Purchases.revenueByNation(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d))),
    "q_top_open_orders" -> ((s, d) =>
      Purchases.topOpenOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q_segment_stats" -> ((s, d) =>
      Purchases.segmentStats(Tables.customer(s, d), Tables.orders(s, d))),
    "q_late_priority" -> ((s, d) =>
      Purchases.latePriorityCounts(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_copurchase" -> ((s, d) => Purchases.coPurchasePairs(Tables.lineitem(s, d))),
    // product centrality: integer-arithmetic PageRank over the full
    // co-purchase graph — bit-deterministic across partitionings, so
    // rows-only only because the oracle cannot express the iteration
    // (SQL forbids aggregates in recursive terms); pinned against an
    // independent local integer PageRank in spec
    // triangle counts + clustering coefficients over the same
    // co-purchase graph q_product_rank ranks — FULL oracle (the
    // degree-ordered orientation and half-up cc snap replay in SQL)
    "q_triangles" -> ((s, d) =>
      operators.Graph.triangles(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))),
    // k-core membership (k = 2 and 3) over the same co-purchase graph
    // — the graph-side curation feature (dense spam/boilerplate
    // cliques survive deep cores); FULL oracle: the peel fixpoint
    // replays as a recursive CTE whose recursion stops when the
    // working level has no below-k node (a NULL sentinel row keeps
    // the final level addressable when the core is EMPTY — the
    // sf0.1 3-core)
    "q_kcore" -> ((s, d) =>
      operators.Graph.kCoreNest(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L),
        Seq(2, 3))),
    // full coreness decomposition (Batagelj & Zaversnik by successive
    // peels — each phase peels the PREVIOUS core's shrunk frame);
    // FULL oracle: 23 chained MATERIALIZED recursive CTEs, each
    // seeding the next level's peel from the previous core
    "q_coreness" -> ((s, d) =>
      operators.Graph.coreness(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L),
        maxK = 24)),
    // the SCALE PATH for the same decomposition, SHARDED BY CONNECTED
    // COMPONENT: star-contraction labels, then each component peels
    // independently — in-executor exact Batagelj–Zaversnik under the
    // size cap (no k-depth cap needed locally — a dense pocket that
    // trips the global ladder's maxK guard is cheap here), the
    // distributed peel only for oversized components. At toy scale
    // the global ladder wins (CC labeling is fixed overhead; the
    // grep-pair honesty note applies); on the dense 100x replica the
    // global ladder ABORTS on its cap while this completes at e 0.42.
    // Same result, same FULL oracle
    "q_coreness_sharded" -> ((s, d) =>
      operators.Graph.corenessSharded(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))),
    // connected components over the co-purchase graph — the
    // component face of the graph family (the labels corenessSharded
    // shards by, surfaced as their own product); FULL oracle: the
    // same star-contraction semantics replayed as a reachability
    // recursive CTE + min-label fold
    "q_components" -> ((s, d) =>
      operators.Graph.components(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))),
    // INCREMENTAL components: today's edge delta (the full graph's
    // edges minus the persisted prior's — prior ⊆ full because pair
    // counts only grow) folds into yesterday's PERSISTED labeling;
    // only touched components re-contract. Same oracle as
    // q_components — the hash gate IS the incremental == full proof
    "q_components_incremental" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val full = operators.Graph.canonicalEdges(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))
      val delta = full.join(priorE, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
      operators.Graph.componentsIncremental(priorE, priorL, delta)
    }),
    // STREAMING component maintenance (sixth DeltaLayout instance —
    // edges are the additive half, labels re-merge at serve/compact):
    // seed from the sliced graph, stream the edge delta per batch,
    // compact mid-stream, serve — hash-matches the SAME full-graph
    // reachability oracle (stream == full, proven by the gate)
    "q_stream_components" -> ((s, d) =>
      streaming.ComponentsStream.componentsMaintainRun(s, d)),
    // INCREMENTAL triangles: counts are ADDITIVE under edge insertion
    // (every union triangle is prior-only or contains a delta edge),
    // so today's delta folds into yesterday's PERSISTED per-node
    // counts arithmetically — candidates enumerate from the delta's
    // common neighbors, prior rows are never recomputed. Same FULL
    // wedge-join oracle as q_triangles: hash gate == the proof
    "q_triangles_incremental" -> ((s, d) => {
      val (priorE, _) = cpIndexShared(s, d)
      val priorT = cpTrianglesShared(s, d)
      val full = operators.Graph.canonicalEdges(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))
      val delta = full.join(priorE, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
      operators.Graph.trianglesIncremental(priorE, priorT, delta)
    }),
    // INCREMENTAL coreness: today's edge delta folds into yesterday's
    // PERSISTED (edges, labels, coreness) artifact — only touched
    // components re-peel (component-sharded, in-executor BZ where
    // small), untouched coreness rows pass through verbatim. Same
    // 23-CTE peel-ladder oracle as q_coreness: the hash gate IS the
    // incremental == full proof
    "q_coreness_incremental" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val priorC = cpCorenessShared(s, d)
      val full = operators.Graph.canonicalEdges(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))
      val delta = full.join(priorE, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
      operators.Graph.corenessIncremental(priorE, priorL, priorC, delta)
    }),
    // STREAMING coreness maintenance (seventh DeltaLayout instance —
    // edges additive, the decomposition re-derives at serve/compact
    // via the touched-only incremental re-peel): seed from the
    // persisted prior triple, stream the edge delta, compact
    // mid-stream, serve — hash-matches the SAME full-graph 23-CTE
    // peel-ladder oracle (stream == full, proven by the gate)
    "q_stream_coreness" -> ((s, d) =>
      streaming.CorenessStream.corenessMaintainRun(s, d)),
    // k-truss: the edge-analog of the k-core (every edge in >= k-2
    // triangles) — the densest rung of the graph-density family.
    // rows-only: the per-round per-edge support recomputation has no
    // tractable SQL twin; pinned vs an independent local peel and the
    // truss-inside-core containment in spec
    "q_ktruss" -> ((s, d) =>
      operators.Graph.kTruss(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L), 3)),
    // COMPONENT-SHARDED k-truss — the corenessSharded discipline for
    // the edge peel (a dense pocket serializes every global round;
    // sharded, it peels in-executor via the exact queue-driven
    // support peel). rows-only for the q_ktruss reason; exact
    // equality with the global peel spec-asserted on shared fixtures
    "q_ktruss_sharded" -> ((s, d) =>
      operators.Graph.kTrussSharded(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L), 3)),
    // INCREMENTAL k-truss: today's edge delta folds into yesterday's
    // PERSISTED (edges, labels, truss) artifact — triangles never
    // cross a component boundary, so only touched components re-peel
    // (in-executor queue-driven where small) and untouched truss
    // edges pass through verbatim with exact within-component
    // support. rows-only for the q_ktruss reason; incremental == full
    // exact equality spec-asserted (completes the density family's
    // incremental matrix: coreness / triangles / truss)
    "q_ktruss_incremental" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val priorT = cpTrussShared(s, d)
      val full = operators.Graph.canonicalEdges(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))
      val delta = full.join(priorE, Seq("a", "b"), "left_anti")
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
      operators.Graph.kTrussIncremental(priorE, priorL, priorT, delta, 3)
    }),
    // DELETION lifecycle, component face: the signed delta folds
    // BOTH directions into yesterday's persisted artifact — adds may
    // merge components, removals may SPLIT one (the genuinely new
    // case: the touched component re-contracts from its surviving
    // edges and each side re-labels to its own min id). FULL oracle:
    // the same reachability CTE over today's (slice-5-delisted)
    // graph — the hash gate IS the signed == full proof
    "q_components_delete" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val (adds, removals) = signedGraphDelta(s, d)
      operators.Graph.componentsSigned(priorE, priorL, adds, removals)
    }),
    // DELETION lifecycle, density face: removals can only LOWER
    // coreness inside their own component — touched components
    // re-peel against prior − removals ∪ adds, untouched rows pass
    // verbatim. Same 23-CTE peel-ladder oracle, over today's graph
    "q_coreness_delete" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val priorC = cpCorenessShared(s, d)
      val (adds, removals) = signedGraphDelta(s, d)
      operators.Graph.corenessSigned(priorE, priorL, priorC, adds, removals)
    }),
    // DELETION lifecycle, cohesion face: removal is NOT arithmetic
    // (a dead edge kills triangles it closed and shifts cc
    // denominators), so the signed form re-runs the wedge join on
    // touched components only. Same FULL wedge-join oracle, over
    // today's graph
    "q_triangles_delete" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val priorT = cpTrianglesShared(s, d)
      val (adds, removals) = signedGraphDelta(s, d)
      operators.Graph.trianglesSigned(priorE, priorL, priorT, adds, removals)
    }),
    // DELETION lifecycle, densest rung: signed truss re-peel.
    // rows-only for the q_ktruss reason; signed == full-peel-over-
    // today's-graph exact equality spec-asserted
    "q_ktruss_delete" -> ((s, d) => {
      val (priorE, priorL) = cpIndexShared(s, d)
      val priorT = cpTrussShared(s, d)
      val (adds, removals) = signedGraphDelta(s, d)
      operators.Graph.kTrussSigned(priorE, priorL, priorT, adds, removals, 3)
    }),
    // REMOVAL-AWARE graph STREAMS — the DeltaLayout discipline over
    // SIGNED (add/remove) edge rows, the last empty column of the
    // graph lifecycle matrix: batches land canonical (a, b, op) rows
    // with loud ambiguity guards, the net delta resolves per pair by
    // last op in batch order, and serve/compact fold through the
    // batch-side signed operators (touched components only).
    // Component face: hash-matches the SAME full reachability oracle
    // as q_components_delete — stream == full over the delisted graph
    "q_stream_components_signed" -> ((s, d) =>
      streaming.SignedGraphStream.componentsSignedRun(s, d)),
    // density face: same 23-CTE peel-ladder oracle as q_coreness_delete
    "q_stream_coreness_signed" -> ((s, d) =>
      streaming.SignedGraphStream.corenessSignedRun(s, d)),
    // cohesion face: same full wedge-join oracle as q_triangles_delete
    "q_stream_triangles_signed" -> ((s, d) =>
      streaming.SignedGraphStream.trianglesSignedRun(s, d)),
    // densest rung: rows-only for the q_ktruss reason; stream ==
    // signed == full-peel equality spec-asserted
    "q_stream_ktruss_signed" -> ((s, d) =>
      streaming.SignedGraphStream.trussSignedRun(s, d)),
    // STREAMING triangle-count maintenance (eighth DeltaLayout
    // instance — the easiest graph stream: counts are ADDITIVE under
    // edge insertion, so no component labeling rides the artifact):
    // seed from the persisted prior (edges, triangles) pair, stream
    // the edge delta, compact mid-stream, serve — hash-matches the
    // SAME full-graph wedge-join oracle as q_triangles (stream ==
    // full, proven by the gate)
    "q_stream_triangles" -> ((s, d) =>
      streaming.TrianglesStream.trianglesMaintainRun(s, d)),
    // STREAMING k-truss maintenance (ninth DeltaLayout instance —
    // the coreness split one rung denser: edges additive, the truss
    // re-derives at serve/compact via the touched-only incremental
    // re-peel): seed from the persisted prior triple, stream the
    // edge delta, compact mid-stream, serve. rows-only for the
    // q_ktruss reason; stream == full peel spec-asserted
    "q_stream_ktruss" -> ((s, d) =>
      streaming.KTrussStream.trussMaintainRun(s, d)),
    // STREAMING pagerank maintenance (tenth DeltaLayout instance,
    // completing the graph family's full lifecycle matrix): the
    // additive state is WEIGHTED (pair counts only grow — batches
    // land per-pair increments, the live graph is a commutative
    // sum-fold) and serving is a WARM-START CASCADE (compaction
    // advances the warm point; serve == the direct warm pageRank
    // over the same state at every instant, spec-asserted, with
    // rank mass conserved). rows-only for the q_product_rank reason
    "q_stream_pagerank" -> ((s, d) =>
      streaming.PageRankStream.ranksMaintainRun(s, d)),
    "q_product_rank" -> ((s, d) =>
      operators.Graph.pageRank(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L))),
    // INCREMENTAL product centrality: warm-start today's ranks from
    // yesterday's PERSISTED rank artifact (built on the graph without
    // ~5% of orders, written once per data version — the production
    // posture: yesterday's run is a read, not a recompute), so the
    // same iteration budget lands much closer to stationarity —
    // rows-only for the q_product_rank reason; warm == local-mirror
    // pinned and the closer-to-stationary claim asserted in spec
    "q_pagerank_incremental" -> ((s, d) =>
      operators.Graph.pageRank(
        Purchases.coPurchaseGraph(Tables.lineitem(s, d), minCount = 2L),
        startRanks = Some(rankIndexShared(s, d)))),
    // DELETION lifecycle, ranking face — completes the 5-face matrix:
    // the signed per-pair WEIGHT delta (wdeltas artifact face) folds
    // into the prior weighted graph (one full-outer join, loud on a
    // disagreeing delta), then the integer power iteration runs over
    // the shrunk graph WARM-STARTED from yesterday's persisted ranks.
    // rows-only for the q_product_rank reason; signed == direct-warm-
    // over-today's-graph bit-equality spec-pinned
    "q_pagerank_delete" -> ((s, d) =>
      operators.Graph.pageRankSigned(
        cpWeightedShared(s, d), cpRanksShared(s, d), cpWDeltaShared(s, d))),
    "q_basket_rules" -> ((s, d) => Purchases.basketRules(Tables.lineitem(s, d))),
    "q_funnel" -> ((s, d) => Etl.funnelConversion(Tables.events(s, d))),
    "q_substitutes" -> ((s, d) =>
      Catalog.substitutes(Tables.lineitem(s, d), Tables.part(s, d), 42L)),
    "q_stats_approx" -> ((s, d) => Catalog.statsApprox(Tables.lineitem(s, d))),
    "q_embed_neardup" -> ((s, d) =>
      // Low-threshold hyperplane LSH trades recall against candidate
      // mass ∝ tables/2^planes: at cos 0.35 (per-plane agreement
      // p≈0.614), 8 planes × 16 tables gives ~28% recall at n²/16
      // candidate mass — more recall per unit of work than the round-1
      // 5×4 (31% at n²/8), without its 32-buckets-per-table blowup.
      // Production semantic dedup thresholds (0.9+) instead use
      // planes=14/tables=8: ~87% recall with near-linear candidates;
      // this corpus has no pairs above cos 0.7, so the entry
      // demonstrates the low-threshold regime.
      Similarity.embedNearDupPairs(Tables.embeddings(s, d),
        threshold = 0.35, planes = 8, tables = 16)),
    "q_pii_redact" -> ((s, d) =>
      TextCleaning.piiRedact(TextCleaning.withSyntheticPii(Tables.documents(s, d)))),
    "q_pii_stats" -> ((s, d) =>
      TextCleaning.piiStats(TextCleaning.withSyntheticPii(Tables.documents(s, d)))),
    "q_quality_sample" -> ((s, d) => Curation.qualitySample(Tables.documents(s, d))),
    "q_shard_assign" -> ((s, d) => Curation.shardAssign(Tables.documents(s, d))),
    "q_normalize_unicode" -> ((s, d) =>
      TextCleaning.normalizeUnicode(Tables.documents(s, d))),
    "q_seq_pack" -> ((s, d) => TextCleaning.packSequences(Tables.documents(s, d))),
    "q_session_window" -> ((s, d) => Etl.sessionWindows(Tables.events(s, d))),
    // the STREAMING session_window formulation, run end-to-end (staged
    // file source → watermark → append-mode session agg → memory sink)
    // and returning the full session set — measured alongside the
    // batch twin, sharing its oracle
    "q_stream_session_window" -> ((s, d) =>
      graft.streaming.EventsStream.sessionWindowRun(s, d)),
    // the STREAMING per-row curation gate run end-to-end (staged file
    // source → stateless curationSignals projection → memory sink);
    // row-identical to batch curationSignals, oracle-checked
    "q_stream_quality_gate" -> ((s, d) =>
      graft.streaming.CurationStream.qualityGateRun(s, d)),
    // the STREAMING drift monitor run end-to-end: every source scored
    // against the persisted full-corpus reference distribution inside
    // foreachBatch; deterministic single micro-batch, oracle-checked
    "q_stream_drift" -> ((s, d) =>
      graft.streaming.DriftStream.driftMonitorRun(s, d)),
    // STREAMING rollup maintenance run end-to-end: even doc_ids seed
    // the persisted base rollup, odd ones stream through foreachBatch
    // as per-batch delta partitions (retried batches overwrite their
    // own partition — exactly-once cumulative state), and the served
    // merge must hash-match the direct full-corpus rollup
    "q_stream_rollup" -> ((s, d) =>
      graft.streaming.RollupStream.rollupMaintainRun(s, d)),
    // the flagship STREAMING ingest-time near-dup gate run end-to-end:
    // one deterministic micro-batch (even doc_ids) band-joined against
    // the persisted full-corpus MinHash signature index inside
    // foreachBatch, index frozen (the serving measurement). MinHash is
    // not SQL-expressible → rows-only; the spec asserts the pair set
    // equals the batch twin minhashPairsAgainst(batch, corpus − batch)
    "q_stream_neardup_gate" -> ((s, d) =>
      graft.streaming.DedupStream.nearDupGateRun(s, d)),
    // REMOVAL-AWARE dedup-gate signatures — the SignedIndexLayout
    // machine for BOTH gate sketch families (MinHash signatures +
    // SimHash fingerprints as two faces of one signed state): a doc
    // deleted upstream leaves the gate's indexes, so re-submitted
    // deleted content is NOT falsely suppressed by its ghost — the
    // run's gate probes re-submissions of the deleted alien slice
    // (zero pairs) alongside copies of surviving docs (pairs at est
    // 1.0, against REPLACED text where replaced). rows-only (the
    // q_dedup_minhash reason); live faces == direct sketches of the
    // surviving corpus spec-pinned
    "q_stream_dedup_signed" -> ((s, d) =>
      graft.streaming.DedupSignedStream.gateMaintainRun(s, d)),
    "q_retention_cohorts" -> ((s, d) => Purchases.retentionCohorts(Tables.orders(s, d))),
    "q_price_percentiles" -> ((s, d) => Purchases.pricePercentiles(Tables.part(s, d))),
    "q_train_split" -> ((s, d) => Curation.splitCounts(Tables.documents(s, d))),
    "q_mix_sources" -> ((s, d) =>
      Curation.mixSources(Tables.documents(s, d), mixRates)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("source")),
    // per-source overrides exercise the budget map (src2's zero budget
    // drops the whole source); default 800 splits every other source
    "q_token_budget_sample" -> ((s, d) =>
      Curation.tokenBudgetSample(Tables.documents(s, d),
        budgets = Map("src1" -> 300L, "src2" -> 0L))),
    // temperature-reweighted source mixing (α = 0.5 flattens the
    // source head, the multilingual-LM sampling rule). The synthetic
    // sources are uniform-sized — temperature would be a no-op — so
    // the entry derives a 70/20/10 skewed domain split first: the
    // head downsamples hardest, the tail clamps at rate 1. The pow
    // micro-snap runs ONCE driver-side; the resulting INTEGER rates
    // ride BOTH the Spark plan and the oracle SQL as literals, so
    // the two engines' libm pow can never disagree at a .5 boundary
    "q_mix_temperature" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("source",
        when(col("doc_id") % 10 < 7, lit("head"))
          .when(col("doc_id") % 10 < 9, lit("mid"))
          .otherwise(lit("tail")))
      val rates = Curation.mixTemperatureRates(docs, alpha = 0.5, budget = 300L)
      mixTempOracleRates = Some(rates)
      Curation.mixTemperatureApply(docs, rates)
        .groupBy("source")
        .agg(min("r_micro").as("r_micro"), count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
    }),
    // DSIR data selection: src0+src1 play the "target domain"; every
    // doc scores its hashed-feature log importance weight vs the raw mix
    "q_dsir_weights" -> ((s, d) =>
      Curation.dsirWeights(Tables.documents(s, d),
        targetSources = Seq("src0", "src1"))),
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.flagContaminated(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25), n = 5)
    }),
    // GRADED contamination: per-doc distinct-gram overlap FRACTION
    // (the GPT-3 appendix-C dirtiness measure) where q_decontaminate
    // gives only the binary verdict; half-up micro snap → FULL oracle
    "q_contamination_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.contaminationOverlap(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25), n = 5)
    }),
    "q_decontaminate_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.flagContaminatedBloom(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25), n = 5)
    }),
    // embedding-space decontamination: eval = first 25 vectors, train =
    // the rest; loose threshold + 16 tables so the synthetic corpus's
    // planted semantic neighbors actually flag (rows-only: LSH candidates)
    "q_decontaminate_semantic" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Curation.flagContaminatedSemantic(
        emb.filter(col("vec_id") >= 25), emb.filter(col("vec_id") < 25),
        threshold = 0.35, planes = 8, tables = 16)
    }),
    // lexical-fuzzy decontamination: MinHash near-dup of any eval doc
    // (the paraphrase/reformat overlap exact n-grams miss); same
    // eval/train split as the exact and semantic forms. rows-only: LSH
    // candidate generation; planted-near-dup detection in spec
    "q_decontaminate_fuzzy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.flagContaminatedFuzzy(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        threshold = 0.35)
    }),
    "q_curation_pipeline" -> ((s, d) => Curation.curationPipeline(Tables.documents(s, d))),
    // the END-TO-END corpus build: one call → per-doc disposition
    // (exact dedup → near-dup components → decontamination → quality →
    // split/shard), every stage the oracle-proven formulation, so the
    // WHOLE BUILD hash-matches DuckDB (incl. the recursive-CTE
    // connected components)
    "q_corpus_build" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.corpusBuild(docs, docs.filter(col("doc_id") < 25))
    }),
    "q_corpus_build_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.corpusBuildReport(
        Curation.corpusBuild(docs, docs.filter(col("doc_id") < 25)))
    }),
    // per-source scorecard of the same build: WHICH source sheds docs
    // and to what (re-crawl → dup_exact spike, supplier leakage →
    // contaminated spike); same composed oracle, rolled per source
    "q_corpus_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.corpusAudit(docs,
        Curation.corpusBuild(docs, docs.filter(col("doc_id") < 25)))
    }),
    "q_dedup_clusters" -> ((s, d) =>
      Dedup.duplicateClustersFromLabels(duplicateLabelsShared(s, d))
        .drop("members")),
    "q_dedup_survivors" -> ((s, d) =>
      Dedup.dedupSurvivorsFromLabels(Tables.documents(s, d), duplicateLabelsShared(s, d))
        .select("doc_id", "source", "n_chars")),
    // the 100 TB cluster-resolution scale path, oracle-proven end to
    // end: star-contraction connected components (O(log² n) rounds,
    // diameter-independent) over the SQL-expressible ngram-jaccard
    // pair set — DuckDB replays the same components via a recursive
    // CTE, so the hash gate covers pairs → components → clusters
    "q_dedup_clusters_cc" -> ((s, d) => {
      val pairs = Dedup.ngramJaccard(Tables.documents(s, d)).select("doc_a", "doc_b")
      Dedup.duplicateClustersFromLabels(Dedup.duplicateLabelsStar(pairs))
        .withColumn("members",
          array_join(transform(col("members"), _.cast("string")), ","))
    }),
    // semantic (embedding-space) twin of q_dedup_survivors: LSH
    // near-dup pairs -> connected components -> one doc per cluster.
    // vec_id and doc_id share the id space by testdata construction.
    "q_semantic_survivors" -> ((s, d) => {
      val pairs = Similarity.embedNearDupPairs(Tables.embeddings(s, d),
          threshold = 0.35, planes = 8, tables = 16)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.dedupSurvivors(Tables.documents(s, d), pairs)
        .select("doc_id", "source", "n_chars")
    }),
    "q_asof_view_before_purchase" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("purchase_value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("viewed_at"),
          round(col("value"), 2).as("view_value"))
      Temporal.asOfJoin(purchases, views, Seq("user_id"), "ts", "viewed_at",
          Seq("viewed_at", "view_value"))
        .orderBy("event_id")
    }),
    "q_range_pairs" -> ((s, d) => Temporal.eventPairsWithin(Tables.events(s, d))),
    "q_attribution" -> ((s, d) => Temporal.lastTouchAttribution(Tables.events(s, d))),
    "q_cohort_pivot" -> ((s, d) => Purchases.cohortPivot(Tables.orders(s, d))),
    "q_price_histogram" -> ((s, d) => Purchases.priceHistogram(Tables.part(s, d))),
    "q_sample_per_category" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      Tables.part(s, d).createOrReplaceTempView("graft_part_tmp")
      s.sql("""SELECT p_type AS category,
              | concat_ws(',', graft_sample(p_name, 3)) AS sample
              |FROM graft_part_tmp GROUP BY p_type ORDER BY category""".stripMargin)
    }),
  )

  /** Full-corpus NB scoring oracle — shared by q_nb_score and the
    * incremental/streaming maintenance entries (q_nb_incremental,
    * q_stream_nb), whose served models must equal a direct retrain
    * exactly. */
  private val nbScoreOracleSql: String =
    """WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
      |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
      |c AS (SELECT term,
      |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      | FROM tk GROUP BY term),
      |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp, CAST(sum(n_neg) AS BIGINT) AS tn,
      |  count(*) AS v FROM c),
      |m AS (SELECT term,
      |  CAST(round((ln((n_pos + 1.0) / (tp + 1.0 * v)) - ln((n_neg + 1.0) / (tn + 1.0 * v))) * 1e6) AS BIGINT) AS lm
      | FROM c CROSS JOIN t),
      |oov AS (SELECT CAST(round((ln(tn + 1.0 * v) - ln(tp + 1.0 * v)) * 1e6) AS BIGINT) AS lo FROM t),
      |s AS (SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(coalesce(m.lm, oov.lo)) AS BIGINT) AS score_micro
      | FROM tk LEFT JOIN m USING (term) CROSS JOIN oov GROUP BY doc_id)
      |SELECT doc_id, n_tokens, score_micro,
      | CAST(round(CAST(score_micro AS DOUBLE) / 1e6, 6) AS DOUBLE) AS score,
      | score_micro > 0 AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  /** q_classifier_calibration's FULL oracle: the nbScore CTEs, then
    * decile binning against the SAME long logit literals the Spark
    * plan carries ([[operators.Classifier.calibrationBoundsMicro]]) —
    * no float bin boundary exists in either engine. */
  private val calibrationOracleSql: String = {
    val binExpr = operators.Classifier.calibrationBoundsMicro(10)
      .map(b => s"(CASE WHEN score_micro >= $b THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
       |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
       |c AS (SELECT term,
       |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
       | FROM tk GROUP BY term),
       |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp, CAST(sum(n_neg) AS BIGINT) AS tn,
       |  count(*) AS v FROM c),
       |m AS (SELECT term,
       |  CAST(round((ln((n_pos + 1.0) / (tp + 1.0 * v)) - ln((n_neg + 1.0) / (tn + 1.0 * v))) * 1e6) AS BIGINT) AS lm
       | FROM c CROSS JOIN t),
       |oov AS (SELECT CAST(round((ln(tn + 1.0 * v) - ln(tp + 1.0 * v)) * 1e6) AS BIGINT) AS lo FROM t),
       |s AS (SELECT doc_id, CAST(sum(coalesce(m.lm, oov.lo)) AS BIGINT) AS score_micro
       | FROM tk LEFT JOIN m USING (term) CROSS JOIN oov GROUP BY doc_id),
       |lab AS (SELECT doc_id,
       |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
       |sc AS (SELECT s.score_micro, lab.y FROM s JOIN lab USING (doc_id)),
       |b AS (SELECT CAST($binExpr AS INT) AS bin, y,
       |  CAST(round(1000000.0 / (1 + exp(-(score_micro / 1000000.0)))) AS BIGINT) AS conf_micro
       | FROM sc),
       |g AS (SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(sum(conf_micro) AS HUGEINT) AS sum_conf FROM b GROUP BY bin),
       |g2 AS (SELECT bin, n, n_pos,
       |  (CAST(n_pos AS HUGEINT) * 2000000 + n) // (CAST(n AS HUGEINT) * 2) AS fp,
       |  (sum_conf * 2 + n) // (CAST(n AS HUGEINT) * 2) AS ac FROM g),
       |g3 AS (SELECT bin, n, n_pos, fp, ac, ac - fp AS gap FROM g2),
       |e AS (SELECT (sum(CAST(n AS HUGEINT) * abs(gap)) * 2 + sum(n))
       |  // (CAST(sum(n) AS HUGEINT) * 2) AS ece FROM g3)
       |SELECT bin, n, n_pos, CAST(fp AS BIGINT) AS frac_pos_micro,
       | CAST(ac AS BIGINT) AS avg_conf_micro, CAST(gap AS BIGINT) AS gap_micro,
       | CAST(e.ece AS BIGINT) AS ece_micro
       |FROM g3, e ORDER BY bin""".stripMargin
  }

  /** Shared entity-resolution match CTEs (mirror [[erCatalog]] /
    * [[erFeed]] / [[operators.Resolution.entityMatchWithIndex]] —
    * catalog dictionary, corrupted feed, df-capped token blocking,
    * exact integer levenshtein+Jaccard scoring, rank-1 threshold);
    * yields `matches(feed_id, canon_id, lev, lev_sim_micro,
    * jacc_micro, score_micro, rank)`. */
  private val erMatchCtes: String =
    """base AS (SELECT p_partkey, p_name || ' ' || lower(p_brand) AS name,
      |  lower(p_type) AS ptype, p_retailprice FROM part),
      |cat AS (SELECT min(p_partkey) AS canon_id, name FROM base GROUP BY name),
      |feed AS (SELECT p_partkey AS feed_id,
      |  CASE p_partkey % 4 WHEN 0 THEN name WHEN 1 THEN name || ' ' || ptype
      |   WHEN 2 THEN substring(name, 2) ELSE replace(name, 'e', '3') END AS name,
      |  p_retailprice FROM base),
      |fn AS (SELECT feed_id, trim(regexp_replace(lower(name), ' +', ' ', 'g')) AS fname FROM feed),
      |cn AS (SELECT canon_id, trim(regexp_replace(lower(name), ' +', ' ', 'g')) AS cname FROM cat),
      |ctok AS (SELECT canon_id, t.token FROM cn,
      |  unnest(list_distinct(string_split(cname, ' '))) AS t(token) WHERE length(t.token) > 0),
      |keep AS (SELECT token FROM ctok GROUP BY token HAVING count(*) <= 100),
      |idx AS (SELECT c.token, c.canon_id FROM ctok c JOIN keep k ON c.token = k.token),
      |ftok AS (SELECT feed_id, fname, t.token FROM fn,
      |  unnest(list_distinct(string_split(fname, ' '))) AS t(token) WHERE length(t.token) > 0),
      |cand AS (SELECT DISTINCT f.feed_id, f.fname, i.canon_id FROM ftok f JOIN idx i ON f.token = i.token),
      |sc AS (SELECT feed_id, c.canon_id, fname, cname,
      |  levenshtein(fname, cname) AS lev,
      |  greatest(length(fname), length(cname)) AS mx,
      |  string_split(fname, ' ') AS ft, string_split(cname, ' ') AS ct
      | FROM cand JOIN cn c ON cand.canon_id = c.canon_id),
      |s2 AS (SELECT feed_id, canon_id, lev,
      |  CASE WHEN mx = 0 THEN 1000000
      |   ELSE (CAST(mx - least(lev, mx) AS BIGINT) * 1000000) // mx END AS lev_sim_micro,
      |  (CAST(len(list_intersect(ft, ct)) AS BIGINT) * 1000000) // len(list_distinct(ft || ct)) AS jacc_micro
      | FROM sc),
      |s3 AS (SELECT feed_id, canon_id, lev, lev_sim_micro, jacc_micro,
      |  (lev_sim_micro + jacc_micro) // 2 AS score_micro FROM s2),
      |matches AS (SELECT feed_id, canon_id, lev, lev_sim_micro, jacc_micro, score_micro,
      |  row_number() OVER (PARTITION BY feed_id ORDER BY score_micro DESC, canon_id) AS rank
      | FROM s3 WHERE score_micro >= 500000)""".stripMargin

  private val erMatchSql: String =
    s"""WITH $erMatchCtes
       |SELECT feed_id, canon_id, CAST(lev AS INTEGER) AS lev,
       | lev_sim_micro, jacc_micro, score_micro,
       | CAST(rank AS INTEGER) AS rank
       |FROM matches WHERE rank <= 1 ORDER BY feed_id, rank""".stripMargin

  private val knOracleSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
       | FROM (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
       |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
       |       FROM d WHERE len(w) >= 2)),
       |bi AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
       |hist AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1, count(*) AS nfwd FROM bi GROUP BY w1),
       |cont AS (SELECT w2, count(*) AS nrev FROM bi GROUP BY w2),
       |tt AS (SELECT count(*) AS ntypes FROM bi),
       |sc AS (SELECT doc_id,
       |  CAST(round(CAST(CAST(-ln(
       |    greatest(CAST(coalesce(cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / c1 +
       |    ((CAST(0.75 AS DOUBLE) * nfwd) / c1) *
       |      (CAST(coalesce(nrev, 1) AS DOUBLE) / ntypes)) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
       | FROM bg LEFT JOIN bi USING (w1, w2) LEFT JOIN hist USING (w1)
       |   LEFT JOIN cont USING (w2), tt),
       |a AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
       | FROM sc GROUP BY doc_id),
       |v AS (SELECT doc_id, n_bigrams, surprisal_unat,
       |  CAST((2 * surprisal_unat + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS avg_surprisal_unat
       | FROM a)
       |SELECT d.doc_id, CAST(coalesce(v.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       | v.surprisal_unat, v.avg_surprisal_unat,
       | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
       | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
       |FROM d LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Modified-KN oracle: DuckDB re-derives the D1/D2/D3+ discounts
    * from the same integer count-of-counts with the same IEEE +−×/
    * chain (no libm in the estimator), including the KenLM sanity
    * fallback — so the discounts, and therefore the whole cascade,
    * are bit-identical to the Scala driver-side literals. */
  private val mknOracleSql: String = {
    val fb = "n1 = 0 OR n2 = 0 OR n3 = 0 OR n4 = 0 OR e1 < 0 OR e1 > 1" +
      " OR e2 < 0 OR e2 > 2 OR e3 < 0 OR e3 > 3"
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
       | FROM (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
       |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
       |       FROM d WHERE len(w) >= 2)),
       |bi AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
       |nc AS (SELECT count(CASE WHEN cb = 1 THEN 1 END) AS n1,
       |  count(CASE WHEN cb = 2 THEN 1 END) AS n2,
       |  count(CASE WHEN cb = 3 THEN 1 END) AS n3,
       |  count(CASE WHEN cb = 4 THEN 1 END) AS n4 FROM bi),
       |de AS (SELECT n1, n2, n3, n4,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 THEN
       |    1 - 2 * (CAST(n1 AS DOUBLE) / (n1 + 2 * n2)) * (CAST(n2 AS DOUBLE) / n1) END AS e1,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 THEN
       |    2 - 3 * (CAST(n1 AS DOUBLE) / (n1 + 2 * n2)) * (CAST(n3 AS DOUBLE) / n2) END AS e2,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 THEN
       |    3 - 4 * (CAST(n1 AS DOUBLE) / (n1 + 2 * n2)) * (CAST(n4 AS DOUBLE) / n3) END AS e3
       | FROM nc),
       |dd AS (SELECT
       |  CASE WHEN $fb THEN CAST(0.75 AS DOUBLE) ELSE e1 END AS d1,
       |  CASE WHEN $fb THEN CAST(0.75 AS DOUBLE) ELSE e2 END AS d2,
       |  CASE WHEN $fb THEN CAST(0.75 AS DOUBLE) ELSE e3 END AS d3
       | FROM de),
       |hist AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1,
       |  count(CASE WHEN cb = 1 THEN 1 END) AS h1,
       |  count(CASE WHEN cb = 2 THEN 1 END) AS h2,
       |  count(CASE WHEN cb >= 3 THEN 1 END) AS h3 FROM bi GROUP BY w1),
       |cont AS (SELECT w2, count(*) AS nrev FROM bi GROUP BY w2),
       |tt AS (SELECT count(*) AS ntypes FROM bi),
       |sc AS (SELECT doc_id,
       |  CAST(round(CAST(CAST(-ln(
       |    greatest(CAST(coalesce(cb, 0) AS DOUBLE) -
       |      coalesce(CASE WHEN cb = 1 THEN d1 WHEN cb = 2 THEN d2
       |               WHEN cb >= 3 THEN d3 END, 0), CAST(0 AS DOUBLE)) / c1 +
       |    ((d1 * h1 + d2 * h2 + d3 * h3) / c1) *
       |      (CAST(coalesce(nrev, 1) AS DOUBLE) / ntypes)) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
       | FROM bg LEFT JOIN bi USING (w1, w2) LEFT JOIN hist USING (w1)
       |   LEFT JOIN cont USING (w2), tt, dd),
       |a AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
       | FROM sc GROUP BY doc_id),
       |v AS (SELECT doc_id, n_bigrams, surprisal_unat,
       |  CAST((2 * surprisal_unat + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS avg_surprisal_unat
       | FROM a)
       |SELECT d.doc_id, CAST(coalesce(v.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       | v.surprisal_unat, v.avg_surprisal_unat,
       | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
       | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
       |FROM d LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  private val phraseOracleSql: String = {
    val qvals = phraseQueries.map { case (id, t) =>
      s"(CAST($id AS BIGINT), '$t')"
    }.mkString(", ")
    s"""WITH q(query_id, query_text) AS (VALUES $qvals),
       |tok AS (SELECT doc_id,
       |  unnest(string_split(lower(text), ' ')) AS term,
       |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos
       | FROM documents),
       |qt AS (SELECT query_id,
       |  unnest(string_split(lower(query_text), ' ')) AS term,
       |  generate_subscripts(string_split(lower(query_text), ' '), 1) AS qpos
       | FROM q),
       |pl AS (SELECT query_id, count(*) AS plen FROM qt GROUP BY query_id),
       |cand AS (SELECT qt.query_id, tok.doc_id, tok.pos - qt.qpos AS start
       | FROM tok JOIN qt ON tok.term = qt.term WHERE tok.pos >= qt.qpos),
       |occ AS (SELECT query_id, doc_id, start, count(*) AS nq
       | FROM cand GROUP BY 1, 2, 3),
       |m AS (SELECT o.query_id, o.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       |  CAST(min(o.start) AS BIGINT) AS first_pos
       | FROM occ o JOIN pl ON o.query_id = pl.query_id
       | WHERE o.nq = pl.plen GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, n_matches, first_pos, row_number() OVER
       | (PARTITION BY query_id ORDER BY n_matches DESC, doc_id) AS rank FROM m)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, n_matches, first_pos
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Verbatim-sequence decontamination oracle: the phrase witness
    * cascade rolled up per doc (1-based subscripts cancel in
    * start = pos − qpos, the phraseOracleSql note). */
  private val decontaminatePhraseOracleSql: String = {
    val qvals = phraseQueries.map { case (id, t) =>
      s"(CAST($id AS BIGINT), '$t')"
    }.mkString(", ")
    s"""WITH q(phrase_id, phrase_text) AS (VALUES $qvals),
       |tok AS (SELECT doc_id,
       |  unnest(string_split(lower(text), ' ')) AS term,
       |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos
       | FROM documents),
       |qt AS (SELECT phrase_id,
       |  unnest(string_split(lower(phrase_text), ' ')) AS term,
       |  generate_subscripts(string_split(lower(phrase_text), ' '), 1) AS qpos
       | FROM q),
       |pl AS (SELECT phrase_id, count(*) AS plen FROM qt GROUP BY phrase_id),
       |cand AS (SELECT qt.phrase_id, tok.doc_id, tok.pos - qt.qpos AS start
       | FROM tok JOIN qt ON tok.term = qt.term WHERE tok.pos >= qt.qpos),
       |occ AS (SELECT phrase_id, doc_id, start, count(*) AS nq
       | FROM cand GROUP BY 1, 2, 3),
       |m AS (SELECT o.phrase_id, o.doc_id, count(*) AS n_occ
       | FROM occ o JOIN pl ON o.phrase_id = pl.phrase_id
       | WHERE o.nq = pl.plen GROUP BY 1, 2),
       |byd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_phrases,
       |  CAST(sum(n_occ) AS BIGINT) AS n_occurrences FROM m GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(n_phrases, 0) AS BIGINT) AS n_phrases,
       | CAST(coalesce(n_occurrences, 0) AS BIGINT) AS n_occurrences,
       | coalesce(n_phrases, 0) = 0 AS keep
       |FROM documents d LEFT JOIN byd USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  private val cmsBuildOracleSql: String =
    """WITH tk AS (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
      |dd AS (SELECT t, unnest(range(0, 4)) AS d FROM tk),
      |b AS (SELECT CAST(d AS INTEGER) AS d,
      |  ('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || t), 1, 8))::UBIGINT::BIGINT % 1024 AS bucket
      | FROM dd)
      |SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
      |FROM b GROUP BY d, bucket ORDER BY d, bucket""".stripMargin

  private val eff = "l_extendedprice*(1-l_discount)"
  /** DuckDB mirror of Spark's round(<double expr>, s): Spark (codegen)
    * rounds the double's SHORTEST DECIMAL REPRESENTATION
    * (BigDecimal.valueOf semantics), so 133.0149999999999986 rounds as
    * "133.015" → 133.02 while 141.73499999999967 rounds down. DuckDB's
    * VARCHAR cast of a double is the same shortest repr, so snapping
    * through VARCHAR → DECIMAL then half-away rounding is bit-identical
    * to Spark for all magnitudes in this schema. */
  private def dr(e: String, s: Int) =
    s"round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,18)),$s)"

  /** Full oracle for the scalar-quantized ANN pair — mirrors
    * [[operators.Similarity.sqIndex]]'s per-vector quantization
    * (scale = max|x|/127 with the 1e-30 zero-vector floor, codes =
    * HALF_UP round of x/scale), the ADC pass's exact int8 dot and
    * ((dot·scale)·qscale)/(norm·qn) association order, the
    * rerankFactor·k = 20 survivor pool under graft_topk's
    * (score DESC, id ASC) total order, and the exact fp rerank. */
  private val sqTopKOracleSql: String =
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS norm,
       |  greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-30) / 127.0 AS scale
       | FROM embeddings),
       |idx AS (SELECT vec_id, norm, scale,
       |  list_transform(v, x -> CAST(${dr("x / scale", 0)} AS DOUBLE)) AS qv FROM n),
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id,
       |  CAST(${dr("list_dot_product(c.qv, q.qv) * c.scale * q.scale / (c.norm * q.norm)", 6)} AS DOUBLE) AS acos
       | FROM idx c, idx q WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |surv AS (SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id, row_number() OVER
       |   (PARTITION BY query_id ORDER BY acos DESC, vec_id) AS rn FROM sc) t
       | WHERE rn <= 20),
       |rer AS (SELECT s.query_id, s.vec_id AS neighbor_id,
       |  CAST(${dr("list_dot_product(c.v, q.v)/(c.norm*q.norm)", 6)} AS DOUBLE) AS cos_r
       | FROM surv s JOIN n c ON c.vec_id = s.vec_id JOIN n q ON q.vec_id = s.query_id),
       |r AS (SELECT query_id, neighbor_id, cos_r,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, CAST(cos_r AS DOUBLE) AS cos_sim,
       | CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Shared BM25 scoring CTEs (expects a CTE `q(query_id, query_text)`
    * upstream; yields `sc(query_id, doc_id, score_micro)`). Constants
    * interpolate from [[operators.Retrieval]] — `K1 + 1.0` prints
    * Scala's shortest double repr, so DuckDB parses the IDENTICAL
    * double Spark's `lit(k1 + 1.0)` folded (2.2 is not exactly
    * representable; the decimal literal 2.2 would be a DIFFERENT
    * double than the 1.2 + 1.0 float sum). */
  private val bm25CoreCtes: String = {
    val k1 = operators.Retrieval.K1
    val idf = dr("ln((CAST(n_docs AS DOUBLE) - df + 0.5) / " +
      "(CAST(df AS DOUBLE) + 0.5) + 1.0)", 6)
    val contrib =
      s"CAST($idf AS DOUBLE) * (CAST(tf.tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE)) / " +
        s"(CAST(tf.tf AS DOUBLE) + CAST($k1 AS DOUBLE) * " +
        "(CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + " +
        "CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE) / " +
        "(CAST(tot_tokens AS DOUBLE) / n_docs)))"
    s"""qt AS (SELECT DISTINCT query_id, term FROM
       |  (SELECT query_id, unnest(string_split(lower(query_text), ' ')) AS term FROM q)),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM
       |  (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |meta AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_tokens FROM dl),
       |dfq AS (SELECT term, count(*) AS df FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
       |sc AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(sum(CAST(round(CAST(CAST($contrib * 1e6 AS VARCHAR)
       |    AS DECIMAL(38,18)), 0) AS BIGINT)) AS BIGINT) AS score_micro
       | FROM tf JOIN qt USING (term) JOIN dfq USING (term) JOIN dl USING (doc_id), meta
       | GROUP BY qt.query_id, tf.doc_id)""".stripMargin
  }

  /** The corpus-build disposition as one DuckDB query: exact
    * ownership, recursive-CTE connected components over the
    * ngram-jaccard pairs of the exact survivors, benchmark gram
    * overlap, the Gopher keep rule, and the md5-prefix split/shard
    * hashes — each the already-proven standalone mirror. */
  private val corpusBuildCte: String =
    """own AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1),
      |s1 AS (SELECT d.* FROM documents d JOIN (SELECT doc_id FROM own) o USING (doc_id)),
      |t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM s1),
      |g AS (SELECT doc_id, lang,
      |  list_distinct(list_transform(range(1, len(w)-1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      | FROM t WHERE len(w) >= 3),
      |gs AS (SELECT doc_id, lang, grams, len(grams) AS sz FROM g),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM gs a JOIN gs b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  AND a.sz >= 0.3 * b.sz AND b.sz >= 0.3 * a.sz
      | WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.3),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
      |reach(id, r) AS (
      | SELECT u, u FROM e
      | UNION
      | SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
      |near AS (SELECT id AS doc_id FROM
      |  (SELECT id, min(r) AS label FROM reach GROUP BY id) WHERE id <> label),
      |dw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |dgrams AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
      |   i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS grams
      | FROM dw WHERE len(w) >= 5),
      |bg AS (SELECT DISTINCT unnest(grams) AS gr FROM dgrams WHERE doc_id < 25),
      |hits AS (SELECT DISTINCT doc_id FROM
      |  (SELECT doc_id, unnest(grams) AS gr FROM dgrams) dg JOIN bg USING (gr)),
      |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tokk FROM documents),
      |pt AS (SELECT doc_id, tokk, count(*) AS n FROM tok GROUP BY 1, 2),
      |qa AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
      |  CAST(sum(CASE WHEN regexp_matches(tokk, '[a-z]') THEN n ELSE 0 END) AS BIGINT) AS n_alpha,
      |  CAST(sum(n * length(tokk)) AS BIGINT) AS len_sum,
      |  count(CASE WHEN tokk IN ('the','be','to','of','and','that','have','with')
      |        THEN 1 END) AS n_stop_hits
      | FROM pt GROUP BY doc_id),
      |qd AS (SELECT doc_id, length(text) - length(replace(text, '#', '')) AS n_hash,
      |  (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis
      | FROM documents),
      |q AS (SELECT qa.doc_id,
      |  (n_words BETWEEN 20 AND 100000
      |   AND CAST(len_sum AS DOUBLE) / n_words >= 3.0
      |   AND CAST(len_sum AS DOUBLE) / n_words <= 10.0
      |   AND CAST(n_hash + n_ellipsis AS DOUBLE) / n_words <= 0.1
      |   AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
      |   AND n_stop_hits >= 1) AS keep
      | FROM qa JOIN qd USING (doc_id)),
      |st AS (SELECT d.doc_id,
      |  CASE WHEN o2.doc_id IS NULL THEN 'dup_exact'
      |       WHEN near.doc_id IS NOT NULL THEN 'dup_near'
      |       WHEN hits.doc_id IS NOT NULL THEN 'contaminated'
      |       WHEN NOT q.keep THEN 'low_quality'
      |       ELSE 'kept' END AS status
      | FROM documents d
      | LEFT JOIN (SELECT doc_id FROM own) o2 USING (doc_id)
      | LEFT JOIN near USING (doc_id)
      | LEFT JOIN hits USING (doc_id)
      | JOIN q USING (doc_id)),
      |fin AS (SELECT doc_id, status,
      |  ('0x' || substr(md5('graft-split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 AS bucket,
      |  CAST(('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 8 AS shard
      | FROM st)""".stripMargin

  /** First-match audit-scan mirror (shared by the batch scan and its
    * stateless streaming twin). */
  private def auditOracleSql: String = {
    val chain = auditPatterns.map(p =>
      s"WHEN strpos(lower(text), '${p.toLowerCase}') > 0 THEN '${p.toLowerCase}'")
      .mkString(" ")
    s"""SELECT doc_id,
       | CASE $chain END AS matched_pattern,
       | (CASE $chain END) IS NOT NULL AS flagged
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** q_expectations' declarative battery — pure data, so ONE list is
    * the single source of truth for the Spark run AND the generated
    * DuckDB oracle (labels and counts must agree bit-for-bit). */
  private[graft] val expectationChecks: Seq[(String, operators.Expectations.Check)] = {
    import operators.Expectations.Check._
    Seq(
      "lineitem" -> NotNull("l_orderkey"),
      "lineitem" -> Unique(Seq("l_orderkey", "l_linenumber")),
      "lineitem" -> InRange("l_quantity", 1.0, 50.0),
      "lineitem" -> InRange("l_discount", 0.0, 0.1),
      "lineitem" -> ForeignKey("l_partkey", "part", "p_partkey"),
      "lineitem" -> ForeignKey("l_orderkey", "orders", "o_orderkey"),
      "orders" -> ForeignKey("o_custkey", "customer", "c_custkey"),
      "orders" -> AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
      "orders" -> Unique(Seq("o_orderkey")),
      "customer" -> NotNull("c_mktsegment"),
      "part" -> InRange("p_size", 1.0, 50.0),
      "part" -> Unique(Seq("p_partkey")))
  }

  /** q_stream_expectations' row-gate battery (the per-row-decidable
    * subset; the tight quantity range fires on ~40 % of rows so the
    * violation CSV is exercised, not vestigial). */
  private val rowGateChecks: Seq[operators.Expectations.Check] = {
    import operators.Expectations.Check._
    Seq(
      NotNull("l_orderkey"),
      InRange("l_quantity", 1.0, 30.0),
      AcceptedValues("l_returnflag", Seq("A", "N", "R")),
      ForeignKey("l_partkey", "part", "p_partkey"))
  }

  /** q_stream_expectations' oracle: the same per-row violation CSV in
    * SQL, generated from the same battery. */
  private def rowGateOracleSql: String = {
    import operators.Expectations.Check._
    val cases = rowGateChecks.map { c =>
      // labels carry free-form AcceptedValues strings — escape them
      // (and the values themselves) for the quoted-literal context
      val lbl = operators.Expectations.sqlLit(operators.Expectations.label(c))
      c match {
        case NotNull(col0) => s"CASE WHEN $col0 IS NULL THEN '$lbl' END"
        case InRange(col0, lo, hi) =>
          s"CASE WHEN $col0 IS NOT NULL AND ($col0 < $lo OR $col0 > $hi) THEN '$lbl' END"
        case AcceptedValues(col0, vs) =>
          val list = vs.map(v => s"'${operators.Expectations.sqlLit(v)}'").mkString(", ")
          s"CASE WHEN $col0 IS NOT NULL AND $col0 NOT IN ($list) THEN '$lbl' END"
        case ForeignKey(col0, pn, pc) =>
          s"""CASE WHEN $col0 IS NOT NULL AND NOT EXISTS
             | (SELECT 1 FROM $pn par WHERE par.$pc = l.$col0) THEN '$lbl' END""".stripMargin
        case u: Unique =>
          throw new IllegalStateException(
            s"row gate cannot hold ${operators.Expectations.label(u)}")
      }
    }
    s"""WITH v AS (SELECT l_orderkey, l_linenumber,
       |  coalesce(array_to_string(list_filter([${cases.mkString(",\n   ")}],
       |   x -> x IS NOT NULL), ';'), '') AS violated
       | FROM lineitem l WHERE l_orderkey % 5 = 0)
       |SELECT l_orderkey, l_linenumber, violated,
       | CAST(CASE WHEN violated = '' THEN 0
       |  ELSE len(string_split(violated, ';')) END AS INTEGER) AS n_violations,
       | violated = '' AS passed
       |FROM v ORDER BY l_orderkey, l_linenumber, violated""".stripMargin
  }

  /** q_expectations' oracle: each check's exact counters re-derived in
    * SQL from the same battery (labels via the shared
    * [[operators.Expectations.label]]). `src` renders a table name to
    * its FROM source — identity for the full battery; the streaming
    * entry substitutes a filtered subquery for the fact table so its
    * bounded slice has the same single-source-of-truth oracle. */
  private def expectationsOracleSql(
      src: String => String = identity): String = {
    import operators.Expectations.Check._
    val selects = expectationChecks.zipWithIndex.map { case ((t0, c), i) =>
      val t = src(t0)
      val head = s"SELECT ${i + 1} AS check_seq, " +
        s"'${operators.Expectations.sqlLit(t0)}' AS table_name, " +
        s"'${operators.Expectations.sqlLit(operators.Expectations.label(c))}' AS \"constraint\""
      c match {
        case NotNull(col0) =>
          s"""$head, CAST(count(*) AS BIGINT) AS n_checked,
             | CAST(count(*) - count($col0) AS BIGINT) AS n_violations FROM $t x""".stripMargin
        case InRange(col0, lo, hi) =>
          s"""$head, CAST(count($col0) AS BIGINT) AS n_checked,
             | CAST(coalesce(sum(CASE WHEN $col0 IS NOT NULL AND ($col0 < $lo OR $col0 > $hi)
             |  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations FROM $t x""".stripMargin
        case AcceptedValues(col0, vs) =>
          val list = vs.map(v => s"'${operators.Expectations.sqlLit(v)}'").mkString(", ")
          s"""$head, CAST(count($col0) AS BIGINT) AS n_checked,
             | CAST(coalesce(sum(CASE WHEN $col0 IS NOT NULL AND $col0 NOT IN ($list)
             |  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations FROM $t x""".stripMargin
        case Unique(cols) =>
          val nn = cols.map(c0 => s"$c0 IS NOT NULL").mkString(" AND ")
          val dk =
            if (cols.size == 1) s"count(DISTINCT ${cols.head})"
            else s"count(DISTINCT CASE WHEN $nn THEN row(${cols.mkString(", ")}) END)"
          s"""$head,
             | CAST(coalesce(sum(CASE WHEN $nn THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_checked,
             | CAST(coalesce(sum(CASE WHEN $nn THEN 1 ELSE 0 END), 0) - $dk AS BIGINT)
             |  AS n_violations FROM $t x""".stripMargin
        case ForeignKey(col0, pn, pc) =>
          s"""$head,
             | CAST((SELECT count(*) FROM $t x WHERE $col0 IS NOT NULL) AS BIGINT) AS n_checked,
             | CAST((SELECT count(*) FROM $t ch WHERE ch.$col0 IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM ${src(pn)} p WHERE p.$pc = ch.$col0)) AS BIGINT) AS n_violations""".stripMargin
      }
    }
    s"""SELECT check_seq, table_name, "constraint", n_checked, n_violations,
       | n_violations = 0 AS passed
       |FROM (${selects.mkString("\nUNION ALL\n")})
       |ORDER BY check_seq""".stripMargin
  }

  /** The lineitem source for the DELETION-lifecycle oracles: today's
    * graph delists the l_orderkey %20==5 order slice (mirrors
    * [[signedGraphDelta]]'s Spark-side filter exactly). */
  private val todayLineitemSrc =
    "(SELECT * FROM lineitem WHERE l_orderkey % 20 <> 5)"

  /** The co-purchase edge CTE shared by the k-core oracles (the
    * q_triangles `e` frame: canonical a<b pairs seen in >= 2 orders),
    * parameterized by the lineitem source so the deletion-lifecycle
    * oracles replay the same graph semantics over today's delisted
    * order set. */
  private def kcoreEdgeCteFrom(src: String): String =
    s"""e0 AS MATERIALIZED (
       | WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey FROM $src li)
       | SELECT a.l_partkey AS a, b.l_partkey AS b
       | FROM items a JOIN items b ON a.okey = b.okey AND a.l_partkey < b.l_partkey
       | GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
  private val kcoreEdgeCte = kcoreEdgeCteFrom("lineitem")

  /** q_components / q_components_incremental / q_components_delete:
    * reachability closure + min-label fold over the e0 co-purchase
    * edges (shared — the incremental form's prior ∪ delta IS the full
    * edge set and the signed form's prior − removals ∪ adds IS
    * today's, so one oracle shape proves both == full). */
  private def componentsOracleSqlFrom(src: String): String =
    s"""WITH RECURSIVE ${kcoreEdgeCteFrom(src)},
       |e AS (SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0),
       |reach(id, r) AS (
       | SELECT u, u FROM e
       | UNION
       | SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
       |lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |nn AS (SELECT label, count(*) AS n_nodes FROM lbl GROUP BY label),
       |ne AS (SELECT l.label AS label, count(*) AS n_edges
       | FROM e0 JOIN lbl l ON e0.a = l.id GROUP BY l.label)
       |SELECT nn.label AS component, CAST(n_nodes AS BIGINT) AS n_nodes,
       | CAST(n_edges AS BIGINT) AS n_edges
       |FROM nn JOIN ne ON nn.label = ne.label
       |ORDER BY component""".stripMargin
  private val componentsOracleSql: String = componentsOracleSqlFrom("lineitem")

  /** One peel level as a recursive CTE pair: `name` iterates the
    * below-k deletion from `src`'s edge set, `name_f` is the stable
    * k-core. The recursion carries a NULL SENTINEL row per produced
    * level so max(it) addresses the FINAL level even when the peel
    * empties the graph (without it, an emptying step leaves max(it)
    * at the last NON-empty level and the oracle would return a
    * non-core); recursion stops when the working level has no node
    * below k — the exact Spark-side fixpoint. MATERIALIZED `_f`
    * blocks CTE inlining, which re-executes the whole upstream chain
    * per reference (observed: file-handle exhaustion at 23 levels).
    * The `it < 200` recursion bound MIRRORS the Spark side's
    * maxRounds=200 (which raises loudly) — keep the two aligned, or a
    * graph needing more peel rounds than the SQL cap makes the oracle
    * silently return a non-core and verify reports a spurious
    * mismatch. */
  private def kcorePeelSql(src: String, k: Int, name: String): String =
    s"""$name AS (
       | SELECT 0 AS it, a, b FROM $src
       | UNION ALL
       | SELECT it+1, a, b FROM (
       |  SELECT p.it AS it, p.a AS a, p.b AS b FROM $name p
       |  WHERE p.a IS NOT NULL
       |   AND (SELECT count(*) FROM $name q WHERE q.it=p.it AND (q.a=p.a OR q.b=p.a)) >= $k
       |   AND (SELECT count(*) FROM $name q WHERE q.it=p.it AND (q.a=p.b OR q.b=p.b)) >= $k
       |  UNION ALL
       |  SELECT DISTINCT s.it AS it, NULL AS a, NULL AS b FROM $name s) f
       | WHERE EXISTS (SELECT 1 FROM (
       |   SELECT n.node FROM (SELECT a AS node FROM $name WHERE a IS NOT NULL
       |     UNION ALL SELECT b FROM $name WHERE a IS NOT NULL) n
       |   GROUP BY n.node HAVING count(*) < $k) x)
       |  AND it < 200
       |), ${name}_f AS MATERIALIZED (
       | SELECT a, b FROM $name
       | WHERE it = (SELECT max(it) FROM $name) AND a IS NOT NULL)""".stripMargin

  /** q_kcore: 2- and 3-core membership with within-core degrees (the
    * 3-core peels from the 2-core — the k-core nest). */
  private def kcoreOracleSql: String = {
    val chain = Seq(kcoreEdgeCte, kcorePeelSql("e0", 2, "c2"),
      kcorePeelSql("c2_f", 3, "c3")).mkString(",\n")
    def lvl(k: Int) =
      s"""SELECT CAST($k AS INTEGER) AS k, node, count(*) AS core_degree
         |FROM (SELECT a AS node FROM c${k}_f UNION ALL SELECT b FROM c${k}_f)
         |GROUP BY node""".stripMargin
    s"""WITH RECURSIVE $chain
       |SELECT k, node, CAST(core_degree AS BIGINT) AS core_degree
       |FROM (${lvl(2)} UNION ALL ${lvl(3)})
       |ORDER BY k, node""".stripMargin
  }

  /** q_triangles (and its incremental twin): the wedge join replays
    * the degree-ordered orientation; SEMI JOIN closes wedges against
    * the canonical undirected edge set. */
  private def trianglesOracleSql: String = trianglesOracleSqlFrom("lineitem")
  private def trianglesOracleSqlFrom(src: String): String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey FROM $src li),
      |e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
      | FROM items a JOIN items b ON a.okey = b.okey AND a.l_partkey < b.l_partkey
      | GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT node, count(*) AS degree FROM
      | (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      | GROUP BY node),
      |o AS (SELECT CASE WHEN da.degree <= db.degree THEN e.a ELSE e.b END AS u,
      |             CASE WHEN da.degree <= db.degree THEN e.b ELSE e.a END AS v
      | FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
      |w AS (SELECT e1.u AS u, e1.v AS x, e2.v AS y
      | FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
      |tr AS (SELECT u, x, y FROM w SEMI JOIN e ON e.a = w.x AND e.b = w.y),
      |pn AS (SELECT node, count(*) AS n_triangles FROM
      | (SELECT u AS node FROM tr UNION ALL SELECT x FROM tr
      |  UNION ALL SELECT y FROM tr) GROUP BY node)
      |SELECT deg.node, deg.degree,
      | CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
      | CAST(CASE WHEN deg.degree < 2 THEN 0 ELSE
      |  (CAST(coalesce(pn.n_triangles, 0) AS HUGEINT) * 4000000
      |    + deg.degree * (deg.degree - 1))
      |   // (CAST(deg.degree AS HUGEINT) * (deg.degree - 1) * 2)
      |  END AS BIGINT) AS cc_micro
      |FROM deg LEFT JOIN pn USING (node) ORDER BY deg.node""".stripMargin

  /** q_coreness: chained successive peels to maxK=24 (each level
    * seeds from the previous core); coreness = 1 + deepest level a
    * node survives, 1 for nodes only in the raw edge set. */
  private def corenessOracleSql: String = corenessOracleSqlFrom("lineitem")
  private def corenessOracleSqlFrom(src: String): String = {
    val maxK = 24
    val chain = (kcoreEdgeCteFrom(src) +: (2 to maxK).map(k =>
      kcorePeelSql(if (k == 2) "e0" else s"c${k - 1}_f", k, s"c$k"))).mkString(",\n")
    val levels = (2 to maxK).map(k =>
      s"""SELECT node, ${k - 1} AS lvl FROM
         |(SELECT a AS node FROM c${k}_f UNION ALL SELECT b FROM c${k}_f) GROUP BY node""".stripMargin)
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE $chain,
       |alln AS (SELECT DISTINCT a AS node FROM e0 UNION SELECT b FROM e0),
       |lv AS ($levels)
       |SELECT alln.node, CAST(coalesce(max(lv.lvl) + 1, 1) AS BIGINT) AS coreness
       |FROM alln LEFT JOIN lv ON alln.node = lv.node
       |GROUP BY alln.node ORDER BY alln.node""".stripMargin
  }

  /** Full BM25 oracle over the driver's literal query set (shared by
    * the online and persisted-index forms — bit-equal by spec). */
  private def bm25OracleSql: String = {
    val vals = bm25Queries.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
    s"""WITH q(query_id, query_text) AS (VALUES $vals),
       |$bm25CoreCtes,
       |r AS (SELECT query_id, doc_id, score_micro, row_number() OVER
       |  (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank FROM sc)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
       | doc_id, score_micro,
       | CAST(round(CAST(score_micro AS DOUBLE) / 1e6, 6) AS DOUBLE) AS score
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }
  private def m(e: String, s: Int = 2) = s"CAST(${dr(e, s)} AS DOUBLE)"
  /** Mirror of StableStats.stableSum. */
  private def sSum(c: String, e: Int, o: Int = 2) =
    s"CAST(round(${dr(s"sum($c)", e)},$o) AS DOUBLE)"
  /** Mirror of StableStats.stableAvg. */
  private def sAvg(c: String, e: Int, o: Int = 2) =
    s"CAST(${dr(s"CAST(${dr(s"sum($c)", e)} AS DOUBLE)/count($c)", o)} AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sSum("l_quantity", 2)} AS sum_qty,
         | ${sSum("l_extendedprice", 2)} AS sum_base_price,
         | ${sSum(eff, 4)} AS sum_disc_price,
         | ${sSum(s"$eff*(1+l_tax)", 6)} AS sum_charge,
         | ${sAvg("l_quantity", 2)} AS avg_qty,
         | ${sAvg("l_extendedprice", 2)} AS avg_price,
         | ${sAvg("l_discount", 2, 4)} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_search_products" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type, p_size,
         | ${m("p_retailprice")} AS retail_price
         |FROM part
         |WHERE lower(p_name) LIKE '%red%' AND p_type = 'ECONOMY'
         |  AND p_size BETWEEN 1 AND 40 AND p_retailprice BETWEEN 900.0 AND 1800.0
         |ORDER BY p_partkey LIMIT 100 OFFSET 10""".stripMargin,
    "q_search_promo" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type, p_size,
         | ${m("p_retailprice")} AS retail_price
         |FROM part
         |WHERE p_type = 'ECONOMY' AND p_partkey IN (
         |  SELECT l_partkey FROM lineitem WHERE l_suppkey = 5 AND l_discount > 0)
         |ORDER BY p_partkey LIMIT 50""".stripMargin,
    "q_search_best_match" ->
      s"""WITH results AS (
         | SELECT p_partkey, p_name, p_brand, p_type, p_size,
         |  ${m("p_retailprice")} AS retail_price
         | FROM part WHERE lower(p_name) LIKE '%ring%'
         | ORDER BY p_partkey LIMIT 100)
         |SELECT p_partkey, p_name, p_brand, p_type, p_size, retail_price,
         | (contains(lower(p_name), 'small ring deluxe')
         |  OR contains('small ring deluxe', lower(p_name))) AS matched
         |FROM results ORDER BY matched DESC, p_partkey LIMIT 1""".stripMargin,
    "q_fuzzy_search" -> {
      val q = "smal ring"
      val qg = (0 to q.length - 3).map(i => q.substring(i, i + 3)).distinct
      val lst = qg.map(g => s"'$g'").mkString("[", ", ", "]")
      s"""WITH g AS (SELECT p_partkey, p_name,
         |  list_distinct(list_transform(range(1, length(lower(p_name)) - 1),
         |    i -> substr(lower(p_name), CAST(i AS INTEGER), 3))) AS grams
         | FROM part WHERE length(lower(p_name)) >= 3),
         |s AS (SELECT p_partkey, p_name, len(grams) AS n_grams,
         |  len(list_intersect(grams, $lst)) AS shared FROM g),
         |sim AS (SELECT p_partkey, p_name,
         |  ${m(s"CAST(shared AS DOUBLE) / (n_grams + ${qg.size} - shared)", 6)} AS similarity
         | FROM s WHERE shared > 0)
         |SELECT p_partkey, p_name, similarity FROM sim WHERE similarity >= 0.3
         |ORDER BY similarity DESC, p_partkey LIMIT 15""".stripMargin
    },
    // bit-equal to q_fuzzy_search by construction (same grams, same
    // scoring — only the access path differs), so it shares the oracle
    "q_fuzzy_search_indexed" -> {
      val q = "smal ring"
      val qg = (0 to q.length - 3).map(i => q.substring(i, i + 3)).distinct
      val lst = qg.map(g => s"'$g'").mkString("[", ", ", "]")
      s"""WITH g AS (SELECT p_partkey, p_name,
         |  list_distinct(list_transform(range(1, length(lower(p_name)) - 1),
         |    i -> substr(lower(p_name), CAST(i AS INTEGER), 3))) AS grams
         | FROM part WHERE length(lower(p_name)) >= 3),
         |s AS (SELECT p_partkey, p_name, len(grams) AS n_grams,
         |  len(list_intersect(grams, $lst)) AS shared FROM g),
         |sim AS (SELECT p_partkey, p_name,
         |  ${m(s"CAST(shared AS DOUBLE) / (n_grams + ${qg.size} - shared)", 6)} AS similarity
         | FROM s WHERE shared > 0)
         |SELECT p_partkey, p_name, similarity FROM sim WHERE similarity >= 0.3
         |ORDER BY similarity DESC, p_partkey LIMIT 15""".stripMargin
    },
    // FULL oracle through the whole entity-resolution cascade:
    // dictionary build, feed corruption, df-capped token blocking,
    // integer levenshtein + token-Jaccard scoring, rank-1 threshold —
    // levenshtein agrees integer-for-integer across engines and every
    // division is truncating-integer, so the match set hashes exactly.
    // The indexed entry serves through the persisted blocking index
    // (bit-equal by construction) and shares the SQL.
    "q_entity_match" -> erMatchSql,
    "q_entity_match_indexed" -> erMatchSql,
    // streamed matching is per-record-local vs the static dictionary,
    // so the whole-feed stream result equals the batch match exactly
    "q_stream_entity_match" -> erMatchSql,
    // posting-size × feed-hit mass per blocking token, from the same
    // df-capped index + feed tokenization CTEs the match oracle uses
    "q_entity_occupancy" ->
      s"""WITH $erMatchCtes,
         |pdf AS (SELECT token, count(*) AS catalog_df FROM idx GROUP BY token),
         |fh AS (SELECT token, count(*) AS feed_hits FROM ftok GROUP BY token)
         |SELECT pdf.token, CAST(catalog_df AS BIGINT) AS catalog_df,
         | CAST(feed_hits AS BIGINT) AS feed_hits,
         | CAST(catalog_df * feed_hits AS BIGINT) AS est_candidates
         |FROM pdf JOIN fh ON pdf.token = fh.token
         |WHERE catalog_df * feed_hits >= 2
         |ORDER BY est_candidates DESC, pdf.token""".stripMargin,
    "q_entity_golden" ->
      s"""WITH $erMatchCtes,
         |pr AS (SELECT feed_id,
         |  CAST(floor(CAST(p_retailprice AS DECIMAL(28,6)) * 100 + 0.5) AS BIGINT) AS price_cents
         | FROM feed),
         |fold AS (SELECT canon_id, count(*) AS n_matched,
         |  min(price_cents) AS min_price_cents, max(price_cents) AS max_price_cents
         | FROM matches JOIN pr USING (feed_id) WHERE rank = 1 GROUP BY canon_id)
         |SELECT cn.canon_id, cn.cname AS name,
         | coalesce(fold.n_matched, 0) AS n_matched, min_price_cents, max_price_cents
         |FROM cn LEFT JOIN fold ON cn.canon_id = fold.canon_id
         |ORDER BY cn.canon_id""".stripMargin,
    "q_lowest_price_category" ->
      s"""WITH eff AS (SELECT l_suppkey, l_partkey, $eff AS eff FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')),
         |m AS (SELECT l_suppkey, min(eff) AS min_eff FROM eff GROUP BY 1),
         |w AS (SELECT DISTINCT e.l_suppkey, e.l_partkey, e.eff
         |      FROM eff e JOIN m ON e.l_suppkey = m.l_suppkey AND e.eff = m.min_eff),
         |lim AS (SELECT * FROM w ORDER BY eff, l_suppkey, l_partkey LIMIT 20)
         |SELECT l_suppkey, l_partkey,
         | ${m("eff")} AS effective_price,
         | ${"CAST(" + dr("(max(eff) OVER () - eff) / max(eff) OVER () * 100", 1) + " AS DOUBLE)"} AS savings_percent
         |FROM lim ORDER BY effective_price, l_suppkey, l_partkey""".stripMargin,
    "q_store_products_search" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type,
         | ${m(s"min($eff)")} AS best_price,
         | count(*) AS n_observations
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_suppkey = 7 AND lower(p_name) LIKE '%red%'
         |GROUP BY p_partkey, p_name, p_brand, p_type
         |ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q_store_lookup" ->
      """SELECT s_suppkey AS store_id, s_name AS store_name,
        | n_name AS city, r_name AS region
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE lower(s_name) LIKE '%5%' AND lower(n_name) LIKE '%1%'
        |ORDER BY store_id""".stripMargin,
    "q_price_compare" ->
      s"""SELECT l_partkey, l_suppkey,
         | ${m("min(l_extendedprice)")} AS list_price,
         | ${m(s"min($eff)")} AS effective_price,
         | ${m(s"min(l_extendedprice) - min($eff)")} AS savings,
         | count(*) AS n_observations
         |FROM lineitem WHERE l_partkey IN (25,125,615,1111)
         |GROUP BY l_partkey, l_suppkey
         |ORDER BY l_partkey, effective_price, l_suppkey""".stripMargin,
    "q_product_card" ->
      s"""WITH latest AS (SELECT *,
         |  row_number() OVER (PARTITION BY l_suppkey
         |    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
         | FROM lineitem WHERE l_partkey = 42)
         |SELECT l_suppkey AS store_id, s_name AS store_name,
         | l_shipdate AS collected_at,
         | ${m("l_extendedprice")} AS list_price,
         | ${m(eff)} AS effective_price,
         | l_discount > 0 AS on_promo
         |FROM latest JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rn = 1
         |ORDER BY effective_price, store_id""".stripMargin,
    "q_lowest_price_per_store" ->
      s"""WITH eff AS (SELECT l_suppkey, l_partkey, $eff AS eff FROM lineitem),
         |m AS (SELECT l_suppkey, min(eff) AS min_eff FROM eff GROUP BY 1),
         |w AS (SELECT DISTINCT e.l_suppkey, e.l_partkey, e.eff
         |      FROM eff e JOIN m ON e.l_suppkey = m.l_suppkey AND e.eff = m.min_eff)
         |SELECT l_suppkey, l_partkey,
         | ${m("eff")} AS effective_price,
         | ${"CAST(" + dr("(max(eff) OVER () - eff) / max(eff) OVER () * 100", 1) + " AS DOUBLE)"} AS savings_percent
         |FROM w ORDER BY l_suppkey, l_partkey""".stripMargin,
    "q_price_anomalies" ->
      s"""WITH st AS (
         | SELECT l_partkey, count(*) AS n,
         |  ${"CAST(" + dr("sum(l_extendedprice)", 2) + " AS DOUBLE)"} AS s1,
         |  ${"CAST(" + dr("sum(l_extendedprice*l_extendedprice)", 4) + " AS DOUBLE)"} AS s2
         | FROM lineitem GROUP BY 1 HAVING count(*) >= 2),
         |x AS (
         | SELECT l.l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         |  s1/n AS mean, sqrt(greatest((s2 - s1*s1/n)/(n-1), 0.0)) AS std
         | FROM lineitem l JOIN st USING (l_partkey))
         |SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         | ${m("l_extendedprice")} AS price,
         | ${m("mean")} AS mean_price,
         | ${m("(l_extendedprice - mean)/std")} AS z_score
         |FROM x WHERE std > 0 AND abs(l_extendedprice - mean) > 2.0*std
         |ORDER BY l_partkey, l_orderkey, l_linenumber""".stripMargin,
    "q_price_history" ->
      s"""SELECT l_partkey, l_suppkey, l_shipdate AS collected_at,
         | ${m("l_extendedprice")} AS price,
         | ${m(eff)} AS effective_price,
         | l_orderkey, l_linenumber
         |FROM lineitem
         |WHERE l_partkey = 42 AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <= TIMESTAMP '2001-12-31'
         |ORDER BY collected_at DESC, l_orderkey, l_linenumber""".stripMargin,
    "q_price_trend" ->
      s"""WITH t AS (SELECT l_partkey,
         |  CAST(${dr(s"sum(CASE WHEN l_shipdate >= TIMESTAMP '1999-06-01' THEN $eff END)", 4)} AS DOUBLE)
         |    / count(CASE WHEN l_shipdate >= TIMESTAMP '1999-06-01' THEN $eff END) AS r_avg,
         |  CAST(${dr(s"sum(CASE WHEN l_shipdate < TIMESTAMP '1999-06-01' THEN $eff END)", 4)} AS DOUBLE)
         |    / count(CASE WHEN l_shipdate < TIMESTAMP '1999-06-01' THEN $eff END) AS o_avg
         | FROM lineitem GROUP BY l_partkey)
         |SELECT l_partkey,
         | ${m("r_avg")} AS recent_avg,
         | ${m("o_avg")} AS older_avg,
         | CASE WHEN r_avg > o_avg*1.05 THEN 'increasing'
         |      WHEN r_avg < o_avg*0.95 THEN 'decreasing'
         |      ELSE 'stable' END AS trend
         |FROM t WHERE r_avg IS NOT NULL AND o_avg IS NOT NULL
         |ORDER BY l_partkey""".stripMargin,
    "q_best_basket" ->
      s"""WITH pp AS (SELECT l_suppkey, l_partkey,
         |  min($eff) AS best_eff, min(l_extendedprice) AS best_list
         | FROM lineitem WHERE l_partkey IN (3,42,77,256,512,999,1024,1500,1776,1999)
         | GROUP BY l_suppkey, l_partkey)
         |SELECT l_suppkey, count(*) AS n_products,
         | ${sSum("best_eff", 4)} AS total_price,
         | ${sSum("best_list - best_eff", 4)} AS total_savings,
         | ${sAvg("best_eff", 4)} AS avg_price_per_product
         |FROM pp GROUP BY l_suppkey
         |ORDER BY n_products DESC, total_price, l_suppkey LIMIT 10""".stripMargin,
    "q_store_products" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type,
         | ${m(s"min($eff)")} AS best_price,
         | count(*) AS n_observations
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_suppkey = 7 AND p_type = 'ECONOMY'
         |GROUP BY p_partkey, p_name, p_brand, p_type
         |ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q_distinct_categories" ->
      "SELECT DISTINCT p_type AS category FROM part ORDER BY category",
    "q_distinct_brands" ->
      "SELECT DISTINCT p_brand AS brand FROM part ORDER BY brand",
    "q_store_info" ->
      s"""WITH obs AS (SELECT l_partkey, l_discount, p_type
         |  FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_suppkey = 7),
         |a AS (SELECT count(DISTINCT l_partkey) AS total_products,
         |  count(DISTINCT CASE WHEN l_discount > 0 THEN l_partkey END) AS products_on_sale,
         |  count(DISTINCT p_type) AS categories_available,
         |  array_to_string(list_sort(list(DISTINCT p_type)), ',') AS category_list
         | FROM obs)
         |SELECT s_suppkey AS store_id, s_name AS store_name, total_products,
         | products_on_sale,
         | ${m("products_on_sale * 100.0 / total_products")} AS sale_percentage,
         | categories_available, category_list
         |FROM supplier, a WHERE s_suppkey = 7""".stripMargin,
    // the wedge join replays the degree-ordered orientation; SEMI JOIN
    // closes wedges against the canonical undirected edge set
    "q_triangles" -> trianglesOracleSql,
    // incremental == full: the delta-fold must reproduce the full
    // wedge-join recount bit-for-bit — same oracle
    "q_triangles_incremental" -> trianglesOracleSql,
    // stream-maintained == full recount through the same wedge join
    "q_stream_triangles" -> trianglesOracleSql,
    "q_kcore" -> kcoreOracleSql,
    "q_coreness" -> corenessOracleSql,
    // incremental == full: the warm path must reproduce the full
    // decomposition bit-for-bit — same ladder oracle
    "q_coreness_incremental" -> corenessOracleSql,
    // stream-maintained == full recompute through the same ladder
    "q_stream_coreness" -> corenessOracleSql,
    // the component-sharded form computes the identical decomposition
    "q_coreness_sharded" -> corenessOracleSql,
    // incremental == full through the same closure (prior ∪ delta
    // is exactly the full e0 edge set)
    "q_components_incremental" -> componentsOracleSql,
    // stream-maintained == full recompute through the same closure
    "q_stream_components" -> componentsOracleSql,
    // reachability closure + min-label fold over the same e0 edges
    "q_components" -> componentsOracleSql,
    // DELETION lifecycle: signed (adds + removals) fold == the same
    // full oracles replayed over TODAY'S graph (slice-5 orders
    // delisted) — the hash gates ARE the signed == full proofs
    "q_components_delete" -> componentsOracleSqlFrom(todayLineitemSrc),
    "q_coreness_delete" -> corenessOracleSqlFrom(todayLineitemSrc),
    "q_triangles_delete" -> trianglesOracleSqlFrom(todayLineitemSrc),
    // SIGNED streams: stream-maintained over (prior − removals) ∪
    // adds == the same full oracles over today's delisted graph —
    // the hash gates ARE the removal-aware stream == full proofs
    "q_stream_components_signed" -> componentsOracleSqlFrom(todayLineitemSrc),
    "q_stream_coreness_signed" -> corenessOracleSqlFrom(todayLineitemSrc),
    "q_stream_triangles_signed" -> trianglesOracleSqlFrom(todayLineitemSrc),
    "q_expectations" -> expectationsOracleSql(),
    // served from merged base+delta partials; the full-battery oracle
    // IS the incremental == full proof
    "q_expectations_incremental" -> expectationsOracleSql(),
    // artifact-served == full battery, proven by the same oracle
    "q_expectations_indexed" -> expectationsOracleSql(),
    // stream-maintained partials serve against the same full-battery
    // oracle — stream == full, proven by hash
    "q_stream_verdicts" -> expectationsOracleSql(name =>
      if (name == "lineitem")
        "(SELECT * FROM lineitem WHERE l_orderkey % 5 = 0)"
      else name),
    "q_stream_expectations" -> rowGateOracleSql,
    "q_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |FROM items a JOIN items b
        |  ON a.okey = b.okey AND a.l_partkey < b.l_partkey
        |GROUP BY part_a, part_b
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q_basket_rules" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey FROM lineitem),
         |n AS (SELECT count(DISTINCT okey) AS n_total FROM items),
         |isup AS (SELECT l_partkey, count(*) AS n_item FROM items GROUP BY 1),
         |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |   count(*) AS n_both
         | FROM items a JOIN items b
         |   ON a.okey = b.okey AND a.l_partkey < b.l_partkey
         | GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT part_a, part_b, n_both, sa.n_item AS n_a, sb.n_item AS n_b,
         | ${m("CAST(n_both AS DOUBLE) / n_total", 6)} AS support,
         | ${m("CAST(n_both AS DOUBLE) / sa.n_item", 6)} AS confidence,
         | ${m("CAST(n_total AS DOUBLE) * n_both / (CAST(sa.n_item AS DOUBLE) * sb.n_item)", 6)} AS lift
         |FROM pairs
         |JOIN isup sa ON part_a = sa.l_partkey
         |JOIN isup sb ON part_b = sb.l_partkey, n
         |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q_late_priority" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_funnel" ->
      s"""WITH f AS (SELECT user_id,
         |  min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         |  min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
         |  min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
         |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
         | FROM events GROUP BY user_id),
         |r AS (SELECT
         |  CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |  CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 >= t0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 >= t0 AND t2 >= t1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 >= t0 AND t2 >= t1 AND t3 >= t2 THEN 1 ELSE 0 END) AS BIGINT) AS n3
         | FROM f)
         |SELECT stage_idx, stage, n_users, pct_of_first FROM (
         | SELECT 1 AS stage_idx, 'signup' AS stage, n0 AS n_users, ${m("n0 * 100.0 / n0")} AS pct_of_first FROM r
         | UNION ALL SELECT 2, 'view', n1, ${m("n1 * 100.0 / n0")} FROM r
         | UNION ALL SELECT 3, 'click', n2, ${m("n2 * 100.0 / n0")} FROM r
         | UNION ALL SELECT 4, 'purchase', n3, ${m("n3 * 100.0 / n0")} FROM r)
         |ORDER BY stage_idx""".stripMargin,
    "q_stats_rollup" ->
      s"""SELECT coalesce(category, 'ALL') AS category,
         | coalesce(brand, 'ALL') AS brand,
         | count(*) AS n_products,
         | ${sAvg("p_retailprice", 2)} AS avg_price,
         | ${m("min(p_retailprice)")} AS min_price,
         | ${m("max(p_retailprice)")} AS max_price
         |FROM (SELECT p_type AS category, p_brand AS brand, p_retailprice FROM part)
         |GROUP BY ROLLUP (category, brand)
         |ORDER BY category, brand""".stripMargin,
    "q_stats" ->
      s"""SELECT count(*) AS total_observations,
         | count(DISTINCT l_suppkey) AS total_stores,
         | count(DISTINCT l_partkey) AS total_products,
         | count(CASE WHEN l_discount > 0 THEN 1 END) AS on_promo,
         | ${sAvg("l_extendedprice", 2)} AS avg_price,
         | ${"CAST(" + dr("count(CASE WHEN l_discount > 0 THEN 1 END) * 100.0 / count(*)", 1) + " AS DOUBLE)"} AS promo_percent
         |FROM lineitem""".stripMargin,
    "q_store_dim" ->
      s"""SELECT r_name AS region, n_name AS nation, count(*) AS n_suppliers,
         | ${sAvg("s_acctbal", 2)} AS avg_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY region, nation""".stripMargin,
    "q_ingest_normalize" ->
      s"""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
         | upper(trim(event_type)) AS event_type,
         | ${m("value")} AS value,
         | CAST(json_extract_string(props,'$$.k') AS INTEGER) AS prop_k
         |FROM events ORDER BY event_id""".stripMargin,
    "q_profile_observations" -> {
      def one(c: String) =
        s"""SELECT '$c' AS column_name, (SELECT count(*) FROM lineitem) AS n_rows,
           | count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_value, CAST(max($c) AS DOUBLE) AS max_value,
           | ${sAvg(c, 2, 4)} AS mean_value
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    "q_dedup_exact" ->
      """SELECT count(*) AS n_rows_after_dedup FROM (
        | SELECT DISTINCT * FROM (
        |  SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem))""".stripMargin,
    "q_latest_per_key" ->
      s"""SELECT l_suppkey, l_partkey, l_shipdate AS collected_at,
         | ${m("l_extendedprice")} AS price
         |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey
         |        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
         |      FROM lineitem)
         |WHERE rn = 1 ORDER BY l_suppkey, l_partkey""".stripMargin,
    "q_scd_price_changes" ->
      s"""SELECT l_suppkey, l_partkey, l_shipdate AS changed_at, l_orderkey, l_linenumber,
         | ${m("prev_price")} AS old_price,
         | ${m("l_extendedprice")} AS new_price,
         | ${m("l_extendedprice - prev_price")} AS delta
         |FROM (SELECT *, lag(l_extendedprice) OVER (PARTITION BY l_suppkey, l_partkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_price
         |      FROM lineitem)
         |WHERE prev_price IS NOT NULL AND prev_price <> l_extendedprice
         |ORDER BY l_suppkey, l_partkey, changed_at, l_orderkey, l_linenumber""".stripMargin,
    "q_sessionize" ->
      s"""WITH flagged AS (
         | SELECT user_id, event_id, ts, value,
         |  CASE WHEN lag(ts) OVER w IS NULL
         |        OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
         | FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         | SELECT user_id, ts, value,
         |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS session_seq
         | FROM flagged)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         | CAST(min(ts) AS TIMESTAMP) AS session_start,
         | CAST(max(ts) AS TIMESTAMP) AS session_end,
         | count(*) AS n_events,
         | ${sSum("value", 2)} AS total_value
         |FROM numbered GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,
    "q_event_windows" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
         | count(*) AS n_events,
         | ${sSum("value", 2)} AS total_value,
         | ${sAvg("value", 2)} AS avg_value
         |FROM events GROUP BY window_start, event_type
         |ORDER BY window_start, event_type""".stripMargin,
    "q_dedup_exact_docs" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies,
        | sha256(text) AS content_hash
        |FROM documents GROUP BY sha256(text) ORDER BY keep_doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
        | FROM t WHERE len(w) >= 3),
        |gs AS (SELECT doc_id, lang, grams, len(grams) AS sz FROM g),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        | FROM gs a JOIN gs b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  AND a.sz >= 0.3 * b.sz AND b.sz >= 0.3 * a.sz)
        |SELECT doc_a, doc_b, jaccard FROM j
        |WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""".stripMargin,
    // containment has NO size-ratio prune (tiny-inside-huge is the
    // target), so the oracle pair join is unpruned within lang
    "q_ngram_containment" ->
      """WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
        | FROM t WHERE len(w) >= 3),
        |gs AS (SELECT doc_id, lang, grams, len(grams) AS sz FROM g),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a,
        |  b.sz AS sz_b, len(list_intersect(a.grams, b.grams)) AS n_common
        | FROM gs a JOIN gs b ON a.lang = b.lang AND a.doc_id < b.doc_id),
        |c AS (SELECT doc_a, doc_b, CAST(sz_a AS BIGINT) AS sz_a,
        |  CAST(sz_b AS BIGINT) AS sz_b, CAST(n_common AS BIGINT) AS n_common,
        |  CAST((n_common * 2000000 + sz_a) // (CAST(sz_a AS BIGINT) * 2) AS BIGINT)
        |   AS containment_a_micro,
        |  CAST((n_common * 2000000 + sz_b) // (CAST(sz_b AS BIGINT) * 2) AS BIGINT)
        |   AS containment_b_micro
        | FROM j)
        |SELECT * FROM c
        |WHERE greatest(containment_a_micro, containment_b_micro) >= 500000
        |ORDER BY doc_a, doc_b""".stripMargin,
    // same pair CTEs as q_ngram_jaccard, then connected components as
    // a recursive reachability closure (fine at oracle scale; Spark
    // runs star contraction instead — the point of the shared hash)
    "q_dedup_clusters_cc" ->
      """WITH RECURSIVE t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
        | FROM t WHERE len(w) >= 3),
        |gs AS (SELECT doc_id, lang, grams, len(grams) AS sz FROM g),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM gs a JOIN gs b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  AND a.sz >= 0.3 * b.sz AND b.sz >= 0.3 * a.sz
        | WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.3),
        |e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
        |reach(id, r) AS (
        | SELECT u, u FROM e
        | UNION
        | SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
        |lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |SELECT label AS cluster_rep, count(*) AS n_docs,
        | array_to_string(list_sort(list(id)), ',') AS members
        |FROM lbl GROUP BY label ORDER BY cluster_rep""".stripMargin,
    // SQ graduates to a FULL oracle (r8): unlike the trained families
    // (IVF/PQ centroids are float sums with engine-unfixed partition
    // order), scalar quantization is a PER-VECTOR map — scale is one
    // max, codes are one mirrored HALF_UP round, the int8 dot is exact
    // in double at any summation order, and graft_topk's total order
    // (score DESC, id ASC) is row_number()-expressible. Both the
    // inline and artifact-serving entries take the same SQL (bit-equal
    // by construction, parquet round-trip asserted in spec).
    "q_embed_sq_topk" -> sqTopKOracleSql,
    "q_embed_sq_topk_indexed" -> sqTopKOracleSql,
    "q_embed_topk" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS norm
         | FROM embeddings),
         |j AS (SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
         |  ${dr("list_dot_product(e2.v, q.v)/(e2.norm*q.norm)", 6)} AS cos_r
         | FROM n q, n e2 WHERE q.vec_id < 10 AND e2.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos_r,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         | FROM j)
         |SELECT query_id, neighbor_id, CAST(cos_r AS DOUBLE) AS cos_sim,
         | CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_lang_id" -> {
      def l(lang: String) = graft.operators.TextAnalysis.stopwords
        .find(_._1 == lang).get._2.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, lang,
         |  list_distinct(string_split(lower(text), ' ')) AS w FROM documents),
         |s AS (SELECT doc_id, lang,
         |  CAST(len(list_intersect(w, ${l("en")})) AS INTEGER) AS s_en,
         |  CAST(len(list_intersect(w, ${l("de")})) AS INTEGER) AS s_de,
         |  CAST(len(list_intersect(w, ${l("es")})) AS INTEGER) AS s_es,
         |  CAST(len(list_intersect(w, ${l("fr")})) AS INTEGER) AS s_fr,
         |  CAST(len(list_intersect(w, ${l("zh")})) AS INTEGER) AS s_zh
         | FROM t)
         |SELECT doc_id, lang,
         | CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |      WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |      WHEN s_fr >= s_zh THEN 'fr'
         |      ELSE 'zh' END AS predicted,
         | s_en, s_de, s_es, s_fr, s_zh
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q_stream_quality_gate" -> {
      def l(lang: String) = graft.operators.TextAnalysis.stopwords
        .find(_._1 == lang).get._2.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, text, CAST(length(text) AS INTEGER) AS n_chars,
         |  string_split(lower(text), ' ') AS w FROM documents),
         |s AS (SELECT doc_id, text, n_chars, w,
         |  CAST(len(list_intersect(list_distinct(w), ${l("en")})) AS INTEGER) AS s_en,
         |  CAST(len(list_intersect(list_distinct(w), ${l("de")})) AS INTEGER) AS s_de,
         |  CAST(len(list_intersect(list_distinct(w), ${l("es")})) AS INTEGER) AS s_es,
         |  CAST(len(list_intersect(list_distinct(w), ${l("fr")})) AS INTEGER) AS s_fr,
         |  CAST(len(list_intersect(list_distinct(w), ${l("zh")})) AS INTEGER) AS s_zh
         | FROM t),
         |sig AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\\S')) AS INTEGER) AS n_tokens,
         |  (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE) / n_chars * 0.5
         |    + CAST(len(list_filter(w, t2 -> list_contains(${l("en")}, t2))) AS DOUBLE) / len(w) * 0.5 >= 0.3
         |    AND len(w) >= 10) AS q_keep
         | FROM s),
         |r AS (SELECT doc_id, lang_pred, n_tokens,
         |  CASE WHEN lang_pred <> 'en' THEN 'lang'
         |       WHEN n_tokens < 20 OR n_tokens > 5000 THEN 'length'
         |       WHEN NOT q_keep THEN 'quality' END AS row_reason
         | FROM sig)
         |SELECT doc_id, lang_pred, n_tokens, (row_reason IS NULL) AS row_keep, row_reason
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "q_quality_score" -> {
      val swList = graft.operators.TextAnalysis.stopwords.head._2
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, text, CAST(length(text) AS INTEGER) AS n_chars,
         |  string_split(lower(text), ' ') AS w FROM documents),
         |u AS (SELECT doc_id, n_chars, CAST(len(w) AS INTEGER) AS n_words,
         |  CAST(n_chars - len(w) + 1 AS DOUBLE) / len(w) AS avg_word_len_raw,
         |  CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio_raw,
         |  CAST(len(list_filter(w, t2 -> list_contains($swList, t2))) AS DOUBLE) / len(w) AS stopword_ratio_raw
         | FROM t)
         |SELECT doc_id, n_chars, n_words,
         | CAST(${dr("avg_word_len_raw", 2)} AS DOUBLE) AS avg_word_len,
         | CAST(${dr("alpha_ratio_raw", 4)} AS DOUBLE) AS alpha_ratio,
         | CAST(${dr("stopword_ratio_raw", 4)} AS DOUBLE) AS stopword_ratio,
         | CAST(${dr("alpha_ratio_raw * 0.5 + stopword_ratio_raw * 0.5", 4)} AS DOUBLE) AS quality_score,
         | (alpha_ratio_raw * 0.5 + stopword_ratio_raw * 0.5 >= 0.3 AND n_words >= 10) AS keep
         |FROM u ORDER BY doc_id""".stripMargin
    },
    "q_token_count" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the micro-nat snap mirrors Spark's round(col) exactly: varchar →
    // DECIMAL first (the dr() discipline at scale 0), because Spark
    // rounds the double's SHORTEST DECIMAL REPR while DuckDB's bare
    // round() rounds the exact binary value — a value within half an
    // ulp of k+0.5 would straddle
    "q_perplexity" -> {
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
         |c AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |model AS (SELECT t, CAST(round(CAST(CAST(-ln(CAST(n AS DOUBLE) / total) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su FROM c, tot),
         |a AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM toks JOIN model USING (t) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, surprisal_unat,
         | CAST((2 * surprisal_unat + n_tokens) // (2 * n_tokens) AS BIGINT) AS avg_surprisal_unat,
         | CAST(round(CAST((2 * surprisal_unat + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal
         |FROM a ORDER BY doc_id""".stripMargin
    },
    // the serving path scores the corpus against its own persisted
    // termCounts, so it is bit-equal to the self-trained form by
    // construction — the driver verifies that equality holds by
    // running the same oracle against both
    "q_perplexity_indexed" -> {
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
         |c AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |model AS (SELECT t, CAST(round(CAST(CAST(-ln(CAST(n AS DOUBLE) / total) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su FROM c, tot),
         |a AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM toks JOIN model USING (t) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, surprisal_unat,
         | CAST((2 * surprisal_unat + n_tokens) // (2 * n_tokens) AS BIGINT) AS avg_surprisal_unat,
         | CAST(round(CAST((2 * surprisal_unat + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal
         |FROM a ORDER BY doc_id""".stripMargin
    },
    "q_perplexity_bigram" -> {
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
         | FROM (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
         |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
         |       FROM d WHERE len(w) >= 2)),
         |toks AS (SELECT unnest(w) AS t FROM d),
         |tot AS (SELECT count(*) AS total FROM toks),
         |uni AS (SELECT t AS w2, count(*) AS n FROM toks GROUP BY t),
         |up AS (SELECT w2, CAST(n AS DOUBLE) / total AS pu FROM uni, tot),
         |hist AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
         |bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) / any_value(c1) AS pb
         | FROM bg JOIN hist USING (w1) GROUP BY w1, w2),
         |sc AS (SELECT doc_id,
         |  CAST(round(CAST(CAST(-ln(0.75 * coalesce(pb, 0) + 0.25 * pu) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
         | FROM bg LEFT JOIN bi USING (w1, w2) JOIN up USING (w2)),
         |a AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM sc GROUP BY doc_id),
         |v AS (SELECT doc_id, n_bigrams, surprisal_unat,
         |  CAST((2 * surprisal_unat + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS avg_surprisal_unat
         | FROM a)
         |SELECT d.doc_id, CAST(coalesce(v.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         | v.surprisal_unat, v.avg_surprisal_unat,
         | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
         |FROM d LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_perplexity_trigram" -> {
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |tg AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
         | FROM (SELECT doc_id, unnest(list_transform(range(3, len(w) + 1),
         |        i -> {'w1': w[i - 2], 'w2': w[i - 1], 'w3': w[i]})) AS g
         |       FROM d WHERE len(w) >= 3)),
         |bp AS (SELECT p.a AS a, p.b AS b
         | FROM (SELECT unnest(list_transform(range(2, len(w) + 1),
         |        i -> {'a': w[i - 1], 'b': w[i]})) AS p
         |       FROM d WHERE len(w) >= 2)),
         |toks AS (SELECT unnest(w) AS t FROM d),
         |tot AS (SELECT count(*) AS total FROM toks),
         |uni AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |c2 AS (SELECT a, b, count(*) AS c2 FROM bp GROUP BY a, b),
         |tri AS (SELECT w1, w2, w3, CAST(count(*) AS DOUBLE) / any_value(c2.c2) AS p3
         | FROM tg JOIN c2 ON c2.a = tg.w1 AND c2.b = tg.w2
         | GROUP BY w1, w2, w3 HAVING count(*) >= 2),
         |bi AS (SELECT c2.a AS w2, c2.b AS w3, CAST(c2.c2 AS DOUBLE) / uni.n AS p2
         | FROM c2 JOIN uni ON uni.t = c2.a WHERE c2.c2 >= 2),
         |up AS (SELECT t AS w3, CAST(n AS DOUBLE) / total AS p1 FROM uni, tot),
         |sc AS (SELECT doc_id,
         |  CAST(round(CAST(CAST(-ln(CASE WHEN p3 IS NOT NULL THEN p3
         |    WHEN p2 IS NOT NULL THEN CAST(0.4 AS DOUBLE) * p2
         |    ELSE CAST(0.4 AS DOUBLE) * (CAST(0.4 AS DOUBLE) * p1) END) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
         | FROM tg LEFT JOIN tri USING (w1, w2, w3) LEFT JOIN bi USING (w2, w3) JOIN up USING (w3)),
         |a AS (SELECT doc_id, count(*) AS n_trigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM sc GROUP BY doc_id),
         |v AS (SELECT doc_id, n_trigrams, surprisal_unat,
         |  CAST((2 * surprisal_unat + n_trigrams) // (2 * n_trigrams) AS BIGINT) AS avg_surprisal_unat
         | FROM a)
         |SELECT d.doc_id, CAST(coalesce(v.n_trigrams, 0) AS BIGINT) AS n_trigrams,
         | v.surprisal_unat, v.avg_surprisal_unat,
         | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
         |FROM d LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // interpolated Kneser-Ney: every model statistic (history totals,
    // continuation type counts, the type total) derives from the one
    // bigram-type CTE, mirroring the Scala's self-consistency; float
    // path matched op-for-op with explicit DOUBLE casts (DuckDB
    // numeric literals are DECIMAL — the trigram lesson). The indexed
    // form serves from the persisted type table, bit-equal by
    // construction — same oracle
    "q_perplexity_kn" -> knOracleSql,
    "q_perplexity_kn_indexed" -> knOracleSql,
    // the maintenance entry serves from the delta-merged model; the
    // full-corpus oracle IS the incremental == full-retrain proof
    "q_kn_incremental" -> knOracleSql,
    "q_perplexity_mkn" -> mknOracleSql,
    "q_perplexity_mkn_indexed" -> mknOracleSql,
    // held-out KN: model statistics from the train split only; the
    // scoring cascade carries the FULL fallback chain (unseen bigram →
    // continuation mass only; unseen history → Pcont; unseen
    // continuation → type-count-1), mirrored branch for branch
    "q_kn_holdout" -> {
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |bgtr AS (SELECT b.w1 AS w1, b.w2 AS w2
         | FROM (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
         |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
         |       FROM d WHERE len(w) >= 2 AND doc_id % 5 != 0)),
         |bgte AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
         | FROM (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
         |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
         |       FROM d WHERE len(w) >= 2 AND doc_id % 5 = 0)),
         |bi AS (SELECT w1, w2, count(*) AS cb FROM bgtr GROUP BY w1, w2),
         |hist AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1, count(*) AS nfwd FROM bi GROUP BY w1),
         |cont AS (SELECT w2, count(*) AS nrev FROM bi GROUP BY w2),
         |tt AS (SELECT count(*) AS ntypes FROM bi),
         |sc AS (SELECT doc_id,
         |  CAST(round(CAST(CAST(-ln(CASE WHEN c1 IS NOT NULL THEN
         |    greatest(CAST(coalesce(cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / c1 +
         |    ((CAST(0.75 AS DOUBLE) * nfwd) / c1) *
         |      (CAST(coalesce(nrev, 1) AS DOUBLE) / ntypes)
         |    ELSE CAST(coalesce(nrev, 1) AS DOUBLE) / ntypes END) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
         | FROM bgte LEFT JOIN bi USING (w1, w2) LEFT JOIN hist USING (w1)
         |   LEFT JOIN cont USING (w2), tt),
         |a AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM sc GROUP BY doc_id),
         |v AS (SELECT doc_id, n_bigrams, surprisal_unat,
         |  CAST((2 * surprisal_unat + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS avg_surprisal_unat
         | FROM a)
         |SELECT d.doc_id, CAST(coalesce(v.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         | v.surprisal_unat, v.avg_surprisal_unat,
         | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // trigram held-out: model CTEs over the train split, the scored
    // stream over the holdout, and the level cascade carried as
    // NESTED CASEs — unseen trigram history drops to the
    // continuation-bigram level, unseen middle word to the
    // continuation unigram, unseen continuation to type-count-1
    "q_kn3_holdout" -> {
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |tgtr AS (SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
         | FROM (SELECT doc_id, unnest(list_transform(range(3, len(w) + 1),
         |        i -> {'w1': w[i - 2], 'w2': w[i - 1], 'w3': w[i]})) AS g
         |       FROM d WHERE len(w) >= 3 AND doc_id % 5 != 0)),
         |tgte AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
         | FROM (SELECT doc_id, unnest(list_transform(range(3, len(w) + 1),
         |        i -> {'w1': w[i - 2], 'w2': w[i - 1], 'w3': w[i]})) AS g
         |       FROM d WHERE len(w) >= 3 AND doc_id % 5 = 0)),
         |t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tgtr GROUP BY 1, 2, 3),
         |h3 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2h, count(*) AS nfwd3
         | FROM t3 GROUP BY 1, 2),
         |m2 AS (SELECT w2, w3, count(*) AS m2c FROM t3 GROUP BY 1, 2),
         |h2 AS (SELECT w2, CAST(sum(m2c) AS BIGINT) AS sumn, count(*) AS nfwd2
         | FROM m2 GROUP BY 1),
         |c1 AS (SELECT w3, count(*) AS nrev1 FROM m2 GROUP BY 1),
         |t1 AS (SELECT count(*) AS nt1 FROM m2),
         |sc AS (SELECT doc_id,
         |  CAST(round(CAST(CAST(-ln(CASE WHEN c2h IS NOT NULL THEN
         |    greatest(CAST(coalesce(c3, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / c2h +
         |    ((CAST(0.75 AS DOUBLE) * nfwd3) / c2h) * (CASE WHEN sumn IS NOT NULL THEN
         |      greatest(CAST(coalesce(m2c, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / sumn +
         |      ((CAST(0.75 AS DOUBLE) * nfwd2) / sumn) *
         |        (CAST(coalesce(nrev1, 1) AS DOUBLE) / nt1)
         |      ELSE CAST(coalesce(nrev1, 1) AS DOUBLE) / nt1 END)
         |    ELSE (CASE WHEN sumn IS NOT NULL THEN
         |      greatest(CAST(coalesce(m2c, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / sumn +
         |      ((CAST(0.75 AS DOUBLE) * nfwd2) / sumn) *
         |        (CAST(coalesce(nrev1, 1) AS DOUBLE) / nt1)
         |      ELSE CAST(coalesce(nrev1, 1) AS DOUBLE) / nt1 END) END) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
         | FROM tgte LEFT JOIN t3 USING (w1, w2, w3) LEFT JOIN h3 USING (w1, w2)
         |   LEFT JOIN m2 USING (w2, w3) LEFT JOIN h2 USING (w2)
         |   LEFT JOIN c1 USING (w3), t1),
         |a AS (SELECT doc_id, count(*) AS n_trigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM sc GROUP BY doc_id),
         |v AS (SELECT doc_id, n_trigrams, surprisal_unat,
         |  CAST((2 * surprisal_unat + n_trigrams) // (2 * n_trigrams) AS BIGINT) AS avg_surprisal_unat
         | FROM a)
         |SELECT d.doc_id, CAST(coalesce(v.n_trigrams, 0) AS BIGINT) AS n_trigrams,
         | v.surprisal_unat, v.avg_surprisal_unat,
         | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // trigram KN: both interpolation levels mirrored op-for-op; every
    // statistic derives from the one trigram-type CTE like the Scala
    "q_perplexity_kn3" -> {
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |tg AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
         | FROM (SELECT doc_id, unnest(list_transform(range(3, len(w) + 1),
         |        i -> {'w1': w[i - 2], 'w2': w[i - 1], 'w3': w[i]})) AS g
         |       FROM d WHERE len(w) >= 3)),
         |t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
         |h3 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2h, count(*) AS nfwd3
         | FROM t3 GROUP BY 1, 2),
         |m2 AS (SELECT w2, w3, count(*) AS m2c FROM t3 GROUP BY 1, 2),
         |h2 AS (SELECT w2, CAST(sum(m2c) AS BIGINT) AS sumn, count(*) AS nfwd2
         | FROM m2 GROUP BY 1),
         |c1 AS (SELECT w3, count(*) AS nrev1 FROM m2 GROUP BY 1),
         |t1 AS (SELECT count(*) AS nt1 FROM m2),
         |sc AS (SELECT doc_id,
         |  CAST(round(CAST(CAST(-ln(
         |    greatest(CAST(coalesce(c3, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / c2h +
         |    ((CAST(0.75 AS DOUBLE) * nfwd3) / c2h) * (
         |      greatest(CAST(coalesce(m2c, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / sumn +
         |      ((CAST(0.75 AS DOUBLE) * nfwd2) / sumn) *
         |        (CAST(coalesce(nrev1, 1) AS DOUBLE) / nt1))) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su
         | FROM tg LEFT JOIN t3 USING (w1, w2, w3) LEFT JOIN h3 USING (w1, w2)
         |   LEFT JOIN m2 USING (w2, w3) LEFT JOIN h2 USING (w2)
         |   LEFT JOIN c1 USING (w3), t1),
         |a AS (SELECT doc_id, count(*) AS n_trigrams, CAST(sum(su) AS BIGINT) AS surprisal_unat
         | FROM sc GROUP BY doc_id),
         |v AS (SELECT doc_id, n_trigrams, surprisal_unat,
         |  CAST((2 * surprisal_unat + n_trigrams) // (2 * n_trigrams) AS BIGINT) AS avg_surprisal_unat
         | FROM a)
         |SELECT d.doc_id, CAST(coalesce(v.n_trigrams, 0) AS BIGINT) AS n_trigrams,
         | v.surprisal_unat, v.avg_surprisal_unat,
         | CAST(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | ${m("exp(round(CAST(v.avg_surprisal_unat AS DOUBLE) / 1e6, 6))", 6)} AS ppl
         |FROM d LEFT JOIN v USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_classifier_score" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
         |w AS (SELECT doc_id,
         |  ('0x' || substr(md5('qc-v1:' || t), 1, 8))::UBIGINT::BIGINT % 1001 - 500 AS wgt
         | FROM toks),
         |s AS (SELECT doc_id, count(*) AS n_tokens, sum(wgt) AS margin FROM w GROUP BY 1)
         |SELECT doc_id, n_tokens, CAST(margin AS BIGINT) AS margin,
         | ${m("1.0/(1.0 + exp(-(CAST(margin AS DOUBLE)/(n_tokens*1000.0))))", 6)} AS score,
         | margin > 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
         |pt AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY 1, 2),
         |a AS (SELECT doc_id,
         |  CAST(sum(n) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN regexp_matches(tok, '[a-z]') THEN n ELSE 0 END) AS BIGINT) AS n_alpha,
         |  CAST(sum(n * length(tok)) AS BIGINT) AS len_sum,
         |  count(CASE WHEN tok IN ('the','be','to','of','and','that','have','with')
         |             THEN 1 END) AS n_stop_hits
         | FROM pt GROUP BY doc_id),
         |d AS (SELECT doc_id,
         |  length(text) - length(replace(text, '#', '')) AS n_hash,
         |  (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis
         | FROM documents)
         |SELECT a.doc_id, n_words,
         | ${m("CAST(len_sum AS DOUBLE) / n_words", 4)} AS mean_word_len,
         | ${m("CAST(n_hash + n_ellipsis AS DOUBLE) / n_words", 6)} AS symbol_ratio,
         | ${m("CAST(n_alpha AS DOUBLE) / n_words", 6)} AS alpha_frac,
         | CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
         | (n_words BETWEEN 20 AND 100000
         |  AND CAST(len_sum AS DOUBLE) / n_words >= 3.0
         |  AND CAST(len_sum AS DOUBLE) / n_words <= 10.0
         |  AND CAST(n_hash + n_ellipsis AS DOUBLE) / n_words <= 0.1
         |  AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
         |  AND n_stop_hits >= 1) AS keep
         |FROM a JOIN d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the stream-maintained rollup must equal the direct recompute —
    // the same oracle shape as q_rollup_incremental
    "q_stream_rollup" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,
    // the drift monitor's single batch scores each source against the
    // FULL corpus distribution (reference seeded from the same table):
    // the sourceDivergence decomposition with q from the corpus —
    // every source term is in the reference, so no q = 0 branch
    "q_stream_drift" ->
      """WITH st AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |c AS (SELECT source, t, count(*) AS cst FROM st GROUP BY 1, 2),
        |s AS (SELECT source, sum(cst) AS ts FROM c GROUP BY 1),
        |g AS (SELECT t, sum(cst) AS cnt FROM c GROUP BY 1),
        |r AS (SELECT sum(cnt) AS rt FROM g),
        |k AS (SELECT c.source, ts, rt,
        |  CAST(round(1e6 * 0.5 * (
        |    (cst / ts) * ln(2.0 * (cst / ts) / ((cst / ts) + (cnt / rt)))
        |    + (cnt / rt) * ln(2.0 * (cnt / rt) / ((cst / ts) + (cnt / rt))))) AS BIGINT)
        |    AS c_micro,
        |  cnt AS ref_n
        | FROM c JOIN g USING (t) JOIN s USING (source) CROSS JOIN r),
        |a AS (SELECT source, ts, rt, count(*) AS n_terms,
        |  sum(c_micro) AS am, sum(ref_n) AS s1 FROM k GROUP BY 1, 2, 3),
        |f AS (SELECT source, CAST(ts AS BIGINT) AS n_tokens,
        |  CAST(n_terms AS BIGINT) AS n_terms,
        |  CAST(round(CAST(am AS DOUBLE) / 1e6
        |    + 0.5 * ln(2.0) * (1.0 - CAST(s1 AS DOUBLE) / rt), 6) AS DOUBLE)
        |    AS js_divergence
        | FROM a)
        |SELECT source, n_tokens, n_terms, js_divergence,
        | js_divergence > 0.1 AS drifted
        |FROM f ORDER BY source""".stripMargin,
    // mirrors the Scala exactly: line split on chr(10) with position,
    // per-line keep signals, ordered string_agg reassembly
    "q_c4_rules" ->
      """WITH x AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |l AS (SELECT doc_id, unnest(range(1, len(ls)+1)) AS pos, ls FROM x),
        |ll AS (SELECT doc_id, pos, ls[CAST(pos AS INTEGER)] AS line FROM l),
        |k AS (SELECT doc_id, pos, line,
        |  (regexp_matches(trim(line), '[.!?"]$') AND len(string_split(line, ' ')) >= 3
        |   AND NOT contains(lower(line), 'javascript')) AS kept FROM ll),
        |a AS (SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
        |  COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY pos), '')
        |    AS clean_text
        | FROM k GROUP BY 1),
        |d AS (SELECT doc_id, contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace FROM documents)
        |SELECT a.doc_id, n_lines, n_kept_lines, clean_text, has_lorem, has_brace,
        | (n_kept_lines >= 5 AND NOT has_lorem AND NOT has_brace) AS keep
        |FROM a JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |g AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gr
         | FROM t WHERE len(w) >= 2),
         |c AS (SELECT doc_id, gr, count(*) AS n FROM g GROUP BY 1, 2),
         |s AS (SELECT doc_id, sum(n) AS total, max(n) AS top FROM c GROUP BY 1)
         |SELECT doc_id, CAST(total AS BIGINT) AS n_ngrams, CAST(top AS BIGINT) AS top_count,
         | ${m("CAST(top AS DOUBLE)/total", 6)} AS top_fraction,
         | (top > 1 AND CAST(top AS DOUBLE)/total > 0.1) AS flagged
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_revenue_by_nation" ->
      s"""SELECT r_name AS region, n_name AS nation,
         | ${sSum(eff, 4)} AS revenue,
         | count(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY revenue DESC, nation""".stripMargin,
    "q_top_open_orders" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         | ${sSum(eff, 4)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_segment_stats" ->
      s"""SELECT c_mktsegment AS segment,
         | count(DISTINCT c_custkey) AS n_customers,
         | count(o_orderkey) AS n_orders,
         | ${sSum("o_totalprice", 2)} AS total_spend,
         | ${sAvg("o_totalprice", 2)} AS avg_order_value
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_mktsegment
         |ORDER BY segment""".stripMargin,
    "q_substitutes" ->
      s"""WITH toks AS (SELECT p_partkey, p_type, p_name,
         |  unnest(string_split(lower(p_name), ' ')) AS tok FROM part),
         |target AS (SELECT tok, p_type AS t_type FROM toks WHERE p_partkey = 42),
         |cand AS (SELECT t.p_partkey, t.p_name, count(DISTINCT t.tok) AS shared_tokens
         | FROM toks t JOIN target g ON t.tok = g.tok AND t.p_type = g.t_type
         | WHERE t.p_partkey <> 42
         | GROUP BY t.p_partkey, t.p_name
         | HAVING count(DISTINCT t.tok) >= 1),
         |best AS (SELECT l_partkey, min($eff) AS best_eff FROM lineitem GROUP BY l_partkey),
         |tp AS (SELECT best_eff AS target_price FROM best WHERE l_partkey = 42)
         |SELECT c.p_partkey, c.p_name, c.shared_tokens,
         | ${m("b.best_eff")} AS best_price,
         | ${m("tp.target_price - b.best_eff")} AS savings
         |FROM cand c JOIN best b ON c.p_partkey = b.l_partkey, tp
         |WHERE b.best_eff < tp.target_price
         |ORDER BY best_price, p_partkey LIMIT 10""".stripMargin,
    "q_pii_redact" -> {
      import graft.operators.TextCleaning.{emailRe, phoneRe, urlRe}
      s"""WITH pii AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com or +1-555-01' || doc_id
         |       || ' via https://example.com/d/' || doc_id AS text
         | FROM documents)
         |SELECT doc_id,
         | regexp_replace(regexp_replace(regexp_replace(text,
         |   '$urlRe', '<URL>', 'g'),
         |   '$emailRe', '<EMAIL>', 'g'),
         |   '$phoneRe', '<PHONE>', 'g') AS clean_text
         |FROM pii ORDER BY doc_id""".stripMargin
    },
    "q_pii_stats" -> {
      import graft.operators.TextCleaning.{emailRe, phoneRe, urlRe}
      s"""WITH pii AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com or +1-555-01' || doc_id
         |       || ' via https://example.com/d/' || doc_id AS text
         | FROM documents),
         |c AS (SELECT doc_id, text,
         |  regexp_replace(text, '$urlRe', '<URL>', 'g') AS no_url
         | FROM pii),
         |c2 AS (SELECT doc_id, text, no_url,
         |  regexp_replace(no_url, '$emailRe', '<EMAIL>', 'g') AS no_email
         | FROM c),
         |n AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$urlRe')) AS INTEGER) AS n_urls,
         |  CAST(len(regexp_extract_all(no_url, '$emailRe')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(no_email, '$phoneRe')) AS INTEGER) AS n_phones
         | FROM c2)
         |SELECT doc_id, n_urls, n_emails, n_phones,
         | (n_urls + n_emails + n_phones > 0) AS has_pii
         |FROM n ORDER BY doc_id""".stripMargin
    },
    // the score CTEs mirror q_classifier_score exactly; the coin flip
    // mirrors q_mix_sources' md5-prefix uniform
    "q_quality_sample" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
         |w AS (SELECT doc_id,
         |  ('0x' || substr(md5('qc-v1:' || t), 1, 8))::UBIGINT::BIGINT % 1001 - 500 AS wgt
         | FROM toks),
         |s AS (SELECT doc_id, count(*) AS n_tokens, sum(wgt) AS margin FROM w GROUP BY 1),
         |sc AS (SELECT doc_id,
         |  ${m("1.0/(1.0 + exp(-(CAST(margin AS DOUBLE)/(n_tokens*1000.0))))", 6)} AS score
         | FROM s)
         |SELECT doc_id, score,
         | (('0x' || substr(md5('qsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |    / 4294967296.0) < score AS kept
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_shard_assign" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |    AS BIGINT) AS h
        | FROM documents)
        |SELECT doc_id, h % 8 AS shard,
        | CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_normalize_unicode" ->
      """SELECT doc_id, nfc_normalize(text) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      """WITH counted AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS INTEGER) AS n_tokens
        | FROM documents),
        |cum AS (SELECT doc_id, source, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        | FROM counted)
        |SELECT source, CAST(floor(cum_before / 2048) AS BIGINT) AS bin,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM cum GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q_asof_view_before_purchase" ->
      s"""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         |  ${m("value")} AS purchase_value FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS viewed_at,
         |  ${m("value")} AS view_value FROM events WHERE event_type = 'view')
         |SELECT p.event_id, p.user_id, p.ts, p.purchase_value, v.viewed_at, v.view_value
         |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.viewed_at
         |ORDER BY event_id""".stripMargin,
    "q_attribution" ->
      s"""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         |  ${m("value")} AS purchase_value FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS viewed_at,
         |  ${m("value")} AS view_value FROM events WHERE event_type = 'view'),
         |j AS (SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
         |  v.viewed_at, v.view_value
         | FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.viewed_at)
         |SELECT event_id, user_id, ts, purchase_value,
         | CASE WHEN viewed_at >= ts - INTERVAL 60 MINUTE THEN viewed_at END AS attributed_view_at,
         | CASE WHEN viewed_at >= ts - INTERVAL 60 MINUTE THEN view_value END AS attributed_value,
         | coalesce(viewed_at >= ts - INTERVAL 60 MINUTE, false) AS attributed
         |FROM j ORDER BY event_id""".stripMargin,
    "q_range_pairs" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT CAST(a.ts AS DATE) AS day, count(*) AS n_pairs
        |FROM e a JOIN e b ON a.user_id <> b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '60 seconds'
        |GROUP BY day ORDER BY day""".stripMargin,
    "q_sample_per_category" ->
      """WITH d AS (SELECT DISTINCT p_type, p_name FROM part)
        |SELECT p_type AS category,
        | array_to_string(list_slice(list(p_name ORDER BY md5(p_name), p_name), 1, 3), ',') AS sample
        |FROM d GROUP BY p_type ORDER BY category""".stripMargin,
    "q_chunk_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |e AS (SELECT doc_id, w, len(w)//10 AS n_full FROM d WHERE len(w)//10 >= 1),
         |x AS (SELECT doc_id, unnest(range(1, n_full+1)) AS i, w FROM e),
         |c AS (SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |  md5(array_to_string(list_slice(w, CAST((i-1)*10+1 AS INTEGER), CAST(i*10 AS INTEGER)), ' ')) AS h
         | FROM x),
         |f AS (SELECT doc_id, chunk_idx,
         |  row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn FROM c)
         |SELECT doc_id, count(*) AS n_chunks,
         | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         | ${m("sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / count(*)", 4)} AS dup_ratio
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_span_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, w, CAST(len(w) // 20 AS INT) AS n_full FROM d),
        |sp AS (SELECT doc_id, unnest(range(1, n_full + 1)) AS pos, w FROM b WHERE n_full >= 1),
        |h AS (SELECT doc_id, pos,
        |  md5(lower(array_to_string(list_slice(w, (pos - 1) * 20 + 1, pos * 20), ' '))) AS hh
        | FROM sp),
        |v AS (SELECT doc_id, pos,
        |  row_number() OVER (PARTITION BY hh ORDER BY doc_id, pos) = 1 AS keep
        | FROM h),
        |k AS (SELECT doc_id, list(pos ORDER BY pos) FILTER (WHERE keep) AS kept_pos
        | FROM v GROUP BY doc_id)
        |SELECT b.doc_id,
        | CAST(b.n_full AS BIGINT) AS n_spans,
        | CAST(coalesce(len(k.kept_pos), 0) AS BIGINT) AS n_kept_spans,
        | CASE WHEN b.n_full = 0 THEN array_to_string(b.w, ' ')
        |      -- array_to_string of an EMPTY list is NULL in DuckDB
        |      -- (Spark's concat_ws gives ''): coalesce for the
        |      -- all-spans-dropped, no-tail doc
        |      ELSE coalesce(array_to_string(
        |        flatten(list_transform(coalesce(k.kept_pos, []),
        |          p -> list_slice(b.w, (p - 1) * 20 + 1, p * 20)))
        |        || list_slice(b.w, b.n_full * 20 + 1, len(b.w)), ' '), '')
        | END AS clean_text
        |FROM b LEFT JOIN k USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // equal-length windows make interval ends monotone in start, so
    // the single-lag island test merges overlaps exactly on both
    // engines (the sessionize flag+running-sum shape)
    "q_exact_substrings" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(range(1, len(toks) - 15 + 2)) AS pos, toks
        | FROM t WHERE len(toks) >= 15),
        |h AS (SELECT doc_id, pos,
        |  md5(array_to_string(list_slice(toks, pos, pos + 14), ' ')) AS hh
        | FROM w),
        |dup AS (SELECT hh FROM h GROUP BY hh HAVING count(*) >= 2),
        |f AS (SELECT doc_id, pos FROM h WHERE hh IN (SELECT hh FROM dup)),
        |g AS (SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w2 IS NULL OR pos > lag(pos) OVER w2 + 15
        |       THEN 1 ELSE 0 END AS new_span
        | FROM f WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)),
        |sp AS (SELECT doc_id, pos,
        |  sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS span_id
        | FROM g)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        | CAST(max(pos) + 14 AS BIGINT) AS span_end,
        | CAST(max(pos) - min(pos) + 15 AS BIGINT) AS span_words,
        | count(*) AS n_windows
        |FROM sp GROUP BY doc_id, span_id
        |ORDER BY doc_id, span_start""".stripMargin,
    // the FULL-corpus spans restricted to the batch half — duplicate
    // counts still span the whole corpus, exactly what the served
    // index + in-batch count must reproduce
    "q_exact_substring_incremental" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(range(1, len(toks) - 15 + 2)) AS pos, toks
        | FROM t WHERE len(toks) >= 15),
        |h AS (SELECT doc_id, pos,
        |  md5(array_to_string(list_slice(toks, pos, pos + 14), ' ')) AS hh
        | FROM w),
        |dup AS (SELECT hh FROM h GROUP BY hh HAVING count(*) >= 2),
        |f AS (SELECT doc_id, pos FROM h
        | WHERE hh IN (SELECT hh FROM dup) AND doc_id % 2 <> 0),
        |g AS (SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w2 IS NULL OR pos > lag(pos) OVER w2 + 15
        |       THEN 1 ELSE 0 END AS new_span
        | FROM f WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)),
        |sp AS (SELECT doc_id, pos,
        |  sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS span_id
        | FROM g)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        | CAST(max(pos) + 14 AS BIGINT) AS span_end,
        | CAST(max(pos) - min(pos) + 15 AS BIGINT) AS span_words,
        | count(*) AS n_windows
        |FROM sp GROUP BY doc_id, span_id
        |ORDER BY doc_id, span_start""".stripMargin,
    // ownership by lexicographic struct min over (doc_id, pos) — both
    // engines order structs field-by-field, and unlike the old scalar
    // doc_id*1e9+pos key it cannot wrap past doc_id ~9.2e9; a token is
    // removed iff covered by a duplicated window and by NO owner
    // window (bool_or over the coverage rows)
    "q_exact_substring_clean" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(range(1, len(toks) - 15 + 2)) AS pos, toks
        | FROM t WHERE len(toks) >= 15),
        |h AS (SELECT doc_id, pos,
        |  md5(lower(array_to_string(list_slice(toks, pos, pos + 14), ' '))) AS hh
        | FROM w),
        |own AS (SELECT hh, min({'doc_id': doc_id, 'pos': pos}) AS okey
        | FROM h GROUP BY hh HAVING count(*) >= 2),
        |cov AS (SELECT doc_id, unnest(range(pos, pos + 15)) AS tpos,
        |  ({'doc_id': doc_id, 'pos': pos} = okey) AS is_owner
        | FROM h JOIN own USING (hh)),
        |rm AS (SELECT doc_id, tpos FROM cov
        | GROUP BY doc_id, tpos HAVING NOT bool_or(is_owner)),
        |tok AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS tpos, toks FROM t),
        |tok2 AS (SELECT doc_id, tpos, toks[tpos] AS tok FROM tok),
        |kept AS (SELECT tok2.doc_id, tok2.tpos, tok2.tok FROM tok2
        | ANTI JOIN rm USING (doc_id, tpos)),
        |rmc AS (SELECT doc_id, count(*) AS n_removed FROM rm GROUP BY doc_id),
        |txt AS (SELECT doc_id,
        |  coalesce(string_agg(tok, ' ' ORDER BY tpos), '') AS clean_text
        | FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        | CAST(coalesce(rmc.n_removed, 0) AS BIGINT) AS n_removed,
        | coalesce(txt.clean_text, '') AS clean_text
        |FROM t LEFT JOIN rmc USING (doc_id) LEFT JOIN txt USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 20 != 0),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 20 = 2 THEN text || ' rev2' ELSE text END) AS h_new
        | FROM documents WHERE doc_id % 20 != 1)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        | CASE WHEN o.doc_id IS NULL THEN 'added'
        |      WHEN n.doc_id IS NULL THEN 'removed'
        |      WHEN h_old = h_new THEN 'unchanged'
        |      ELSE 'changed' END AS status
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // merged-histogram quantiles must equal the direct recompute; the
    // rank arithmetic is pure-rational integers on both engines
    "q_quantile_rollup" ->
      """WITH m AS (SELECT source, len(string_split(text, ' ')) AS bin FROM documents),
        |h AS (SELECT source, bin, count(*) AS cnt FROM m GROUP BY 1, 2),
        |a AS (SELECT '__all__' AS source, bin, sum(cnt) AS cnt FROM h GROUP BY bin),
        |u AS (SELECT source, bin, cnt FROM h UNION ALL SELECT source, bin, cnt FROM a),
        |t AS (SELECT source, sum(cnt) AS n FROM u GROUP BY source),
        |c AS (SELECT u.source, bin, cnt, n,
        |  sum(cnt) OVER (PARTITION BY u.source ORDER BY bin) AS cum
        | FROM u JOIN t ON t.source = u.source)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        | CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN bin END) * 1 AS BIGINT) AS p50_tokens,
        | CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN bin END) * 1 AS BIGINT) AS p90_tokens,
        | CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bin END) * 1 AS BIGINT) AS p99_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // the incremental path must land EXACTLY on the direct recompute —
    // the oracle is the direct per-(source, lang) rollup over the
    // current snapshot, nothing incremental about it
    "q_rollup_incremental" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,
    // same chunking as q_chunk_dedup; unique chunks are pruned before
    // the self-join, the diagonal counts n·(n−1)/2 within-source pairs
    "q_dup_provenance" ->
      s"""WITH d AS (SELECT source, string_split(lower(text), ' ') AS w FROM documents),
         |e AS (SELECT source, w, len(w)//10 AS n_full FROM d WHERE len(w)//10 >= 1),
         |x AS (SELECT source, unnest(range(1, n_full+1)) AS i, w FROM e),
         |c AS (SELECT source,
         |  md5(array_to_string(list_slice(w, CAST((i-1)*10+1 AS INTEGER), CAST(i*10 AS INTEGER)), ' ')) AS h
         | FROM x),
         |hs AS (SELECT h, source, count(*) AS n FROM c GROUP BY 1, 2),
         |t AS (SELECT h FROM (SELECT h, sum(n) AS tn FROM hs GROUP BY 1) WHERE tn > 1),
         |dd AS (SELECT hs.* FROM hs JOIN t USING (h)),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |  CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2 ELSE a.n * b.n END AS np
         | FROM dd a JOIN dd b ON a.h = b.h AND a.source <= b.source)
         |SELECT source_a, source_b, count(*) AS n_shared_chunks,
         | CAST(sum(np) AS BIGINT) AS n_dup_pairs
         |FROM p WHERE np > 0 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tfidf_topterms" -> {
      val idf = dr("ln(CAST(n_docs AS DOUBLE) / df)", 6)
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, term, tf, df,
         |  CAST(${dr(s"tf * CAST($idf AS DOUBLE)", 6)} AS DOUBLE) AS tfidf
         | FROM tf JOIN dfq USING (term), n),
         |rk AS (SELECT *, CAST(row_number() OVER
         |  (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rank FROM scored)
         |SELECT doc_id, rank, term, tf, df, tfidf FROM rk WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin
    },
    "q_top_terms" ->
      """WITH d AS (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS term
        | FROM documents)
        |SELECT term, count(*) AS doc_freq FROM d GROUP BY term
        |ORDER BY doc_freq DESC, term LIMIT 20""".stripMargin,
    "q_collocations" -> {
      val pmi = dr(
        "ln((CAST(n_xy AS DOUBLE) * nt * nt) / (CAST(nb AS DOUBLE) * n_x * n_y))", 6)
      s"""WITH d AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
         |tot AS (SELECT sum(len(w)) AS nt,
         |  sum(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END) AS nb FROM d),
         |uni AS (SELECT unnest(w) AS t FROM d),
         |u AS (SELECT t, count(*) AS n FROM uni GROUP BY t),
         |bg AS (SELECT b.w1 AS w1, b.w2 AS w2
         | FROM (SELECT unnest(list_transform(range(2, len(w) + 1),
         |        i -> {'w1': w[i - 1], 'w2': w[i]})) AS b
         |       FROM d WHERE len(w) >= 2)),
         |bc AS (SELECT w1, w2, count(*) AS n_xy FROM bg GROUP BY w1, w2
         |       HAVING count(*) >= 5)
         |SELECT bc.w1, bc.w2, bc.n_xy, ux.n AS n_x, uy.n AS n_y,
         | CAST($pmi AS DOUBLE) AS pmi
         |FROM bc JOIN u ux ON ux.t = bc.w1 JOIN u uy ON uy.t = bc.w2, tot
         |ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT 50""".stripMargin
    },
    "q_ccnet_buckets" -> {
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
         |c AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |model AS (SELECT t, CAST(round(CAST(CAST(-ln(CAST(n AS DOUBLE) / total) * 1e6 AS VARCHAR) AS DECIMAL(38,18)),0) AS BIGINT) AS su FROM c, tot),
         |a AS (SELECT doc_id, count(*) AS n, CAST(sum(su) AS BIGINT) AS s
         | FROM toks JOIN model USING (t) GROUP BY doc_id),
         |sc AS (SELECT doc_id, CAST((2 * s + n) // (2 * n) AS BIGINT) AS au FROM a),
         |sl AS (SELECT d.doc_id, d.lang, sc.au
         | FROM documents d JOIN sc USING (doc_id)),
         |hist AS (SELECT lang, au, count(*) AS nv
         | FROM sl GROUP BY lang, au),
         |cum AS (SELECT lang, au,
         |  sum(nv) OVER (PARTITION BY lang ORDER BY au
         |                ROWS UNBOUNDED PRECEDING) AS cum_le FROM hist),
         |tl AS (SELECT lang, sum(nv) AS n_lang FROM hist GROUP BY lang),
         |b AS (SELECT cum.lang, cum.au,
         |  CASE WHEN cum.cum_le * 3 <= tl.n_lang THEN 'head'
         |       WHEN cum.cum_le * 3 <= tl.n_lang * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         | FROM cum JOIN tl USING (lang))
         |SELECT sl.doc_id, sl.lang,
         | CAST(round(CAST(sl.au AS DOUBLE) / 1e6, 6) AS DOUBLE) AS avg_surprisal,
         | b.bucket
         |FROM sl JOIN b USING (lang, au) ORDER BY sl.doc_id""".stripMargin
    },
    // manifest identity is exact cross-engine: md5 over the utf-8
    // payload bytes, octet length, and the modality assignment. codec
    // is the constant 'stub' ON THIS CORPUS because a text payload can
    // never really decode (magic-byte sniffs may fire — "BM…" text —
    // but ImageIO/AudioSystem then fail and the decoder falls back);
    // the REAL decode paths are spec-asserted on genuine PNG/WAV bytes.
    "q_multimodal_features" ->
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | md5(text) AS checksum,
        | 'stub' AS codec
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_vocab_stats" ->
      s"""WITH t AS (SELECT source, unnest(string_split(lower(text), ' ')) AS term
         | FROM documents)
         |SELECT source, count(*) AS n_tokens,
         | count(DISTINCT term) AS n_terms,
         | ${m("CAST(count(DISTINCT term) AS DOUBLE) / count(*)", 6)} AS type_token_ratio
         |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // same JS decomposition as the Scala: only terms present in each
    // source are rowed; the absent-term mass is the (ln 2)/2·(1 − Σq)
    // closed form; per-term contributions snap to integer micro-nats
    "q_source_divergence" ->
      """WITH st AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |c AS (SELECT source, t, count(*) AS cst FROM st GROUP BY 1, 2),
        |s AS (SELECT source, sum(cst) AS ts FROM c GROUP BY 1),
        |g AS (SELECT t, sum(cst) AS ct FROM c GROUP BY 1),
        |tot AS (SELECT sum(ts) AS tt FROM s),
        |k AS (SELECT c.source, ts, tt,
        |  CAST(round(1e6 * 0.5 * (
        |    (cst / ts) * ln(2.0 * (cst / ts) / ((cst / ts) + ((ct - cst) / (tt - ts))))
        |    + CASE WHEN ct > cst THEN ((ct - cst) / (tt - ts)) *
        |        ln(2.0 * ((ct - cst) / (tt - ts)) / ((cst / ts) + ((ct - cst) / (tt - ts))))
        |      ELSE 0.0 END)) AS BIGINT) AS c_micro,
        |  ct - cst AS rest_n
        | FROM c JOIN g USING (t) JOIN s USING (source) CROSS JOIN tot),
        |a AS (SELECT source, ts, tt, count(*) AS n_terms,
        |  sum(c_micro) AS am, sum(rest_n) AS s1 FROM k GROUP BY 1, 2, 3)
        |SELECT source, CAST(ts AS BIGINT) AS n_tokens, CAST(n_terms AS BIGINT) AS n_terms,
        | CAST(round(CAST(am AS DOUBLE) / 1e6
        |   + 0.5 * ln(2.0) * (1.0 - CAST(s1 AS DOUBLE) / (tt - ts)), 6) AS DOUBLE)
        |   AS js_divergence
        |FROM a ORDER BY source""".stripMargin,
    "q_corpus_stats" ->
      s"""WITH t AS (SELECT source, n_chars,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\\S')) AS INTEGER) AS n_tokens
         | FROM documents)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         | min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
         | ${m("quantile_cont(n_tokens, 0.5)")} AS p50_tokens,
         | ${m("quantile_cont(n_tokens, 0.9)")} AS p90_tokens,
         | ${sAvg("n_chars", 0)} AS avg_chars
         |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // exact oracle is valid: the test corpus's 10th term count is far
    // above N/257, the MG bound under which candidates are guaranteed
    "q_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
        |SELECT term, count(*) AS n_occurrences FROM toks GROUP BY term
        |ORDER BY n_occurrences DESC, term LIMIT 10""".stripMargin,
    "q_domain_stats" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
        |       || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        |       || ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR)
        |       || '.example.net/a/' || CAST(doc_id AS VARCHAR) AS text
        | FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^ ]+')) AS url FROM t)
        |SELECT regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain,
        | count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
        |FROM u GROUP BY domain ORDER BY domain""".stripMargin,
    "q_url_dedup" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' https://www.shop' || CAST(doc_id % 7 AS VARCHAR)
        |       || '.example.com/item/' || CAST(doc_id % 50 AS VARCHAR)
        |       || '?utm_source=feed&ref=tw'
        |       || ' http://shop' || CAST(doc_id % 7 AS VARCHAR)
        |       || '.example.com/item/' || CAST(doc_id % 50 AS VARCHAR)
        |       || '/#reviews' AS text
        | FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^ ]+')) AS url FROM t),
        |c AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    lower(url), '#.*$', ''), '\?.*$', ''), '^https?://', ''), '^www\.', ''), '/$', '')
        |    AS canonical
        | FROM u)
        |SELECT canonical, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls,
        | min(doc_id) AS keeper_doc
        |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin,
    "q_embed_outliers" -> {
      // centroid = per-position SUM (not mean): cosine is
      // scale-invariant and sum/n can land exactly on a rounding
      // half-boundary where the engines' decimal round-trips disagree
      val cos = dr(
        "list_dot_product(v, cv) / " +
          "(sqrt(list_sum(list_transform(v, x -> x*x))) * cnorm)", 6)
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (SELECT generate_subscripts(v, 1) AS i, ${dr("unnest(v)", 6)} AS xe FROM e),
         |c AS (SELECT i, CAST(${dr("sum(xe)", 6)} AS DOUBLE) AS m FROM x GROUP BY i),
         |cl AS (SELECT list(m ORDER BY i) AS cv FROM c),
         |cn AS (SELECT cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnorm FROM cl)
         |SELECT vec_id, label, CAST($cos AS DOUBLE) AS cos_centroid
         |FROM e, cn
         |ORDER BY cos_centroid ASC, vec_id LIMIT 25""".stripMargin
    },
    "q_train_split" ->
      """WITH b AS (SELECT ('0x' || substr(md5('graft-split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 AS bucket
        | FROM documents)
        |SELECT CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val'
        |            ELSE 'test' END AS split,
        | count(*) AS n_docs
        |FROM b GROUP BY split ORDER BY split""".stripMargin,
    "q_mix_sources" ->
      """WITH kept AS (
        | SELECT * FROM documents
        | WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         / 4294967296.0
        |   < CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.25
        |                 WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.75 ELSE 1.0 END)
        |SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    // q_mix_temperature's oracle is GENERATED (mixTempOracleSqlEntry):
    // the driver-computed integer rates ride it as literals, so the
    // pow micro-snap is never re-run by a second libm,
    // bit-equal to q_decontaminate by construction (the bloom prune has
    // no false negatives and the exact join kills false positives), so
    // it shares the oracle — the driver verifies that equality holds
    "q_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |   i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS grams
        | FROM d WHERE len(w) >= 5),
        |bg AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id < 25),
        |dg AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id >= 25),
        |hits AS (SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (gr) GROUP BY doc_id)
        |SELECT b.doc_id, coalesce(hits.n, 0) AS n_contaminated_grams,
        | coalesce(hits.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) b
        |LEFT JOIN hits USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_token_budget_sample" ->
      """WITH c AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS INTEGER) AS n_tokens,
        |  CAST(('0x' || substr(md5('budget-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |    AS BIGINT) AS h
        | FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        | FROM c)
        |SELECT doc_id, source, n_tokens, cum_before,
        | cum_before < CASE source WHEN 'src1' THEN 300 WHEN 'src2' THEN 0 ELSE 800 END AS kept
        |FROM w ORDER BY doc_id""".stripMargin,
    // same hashed-feature model as the Scala: unigrams + adjacent
    // bigrams → md5-prefix bucket; Laplace-smoothed ln-ratio per bucket
    // snapped to integer micro-nats so the per-doc sum is an exact
    // integer (order-independent in BOTH engines; a float sum here
    // measurably flips the 4th decimal run-to-run)
    "q_nb_train" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
        |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
        |c AS (SELECT term,
        |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        | FROM tk GROUP BY term),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp, CAST(sum(n_neg) AS BIGINT) AS tn,
        |  count(*) AS v FROM c)
        |SELECT term, n_pos, n_neg,
        | CAST(round((ln((n_pos + 1.0) / (tp + 1.0 * v)) - ln((n_neg + 1.0) / (tn + 1.0 * v))) * 1e6) AS BIGINT) AS llr_micro
        |FROM c CROSS JOIN t ORDER BY term""".stripMargin,
    "q_nb_score" -> nbScoreOracleSql,
    // incremental / streaming NB maintenance: both serve the corpus
    // from a maintained model that must equal a full retrain exactly
    // (counts are linear), so the SAME direct-train oracle is the
    // incremental == full proof
    "q_nb_incremental" -> nbScoreOracleSql,
    "q_stream_nb" -> nbScoreOracleSql,
    // NB eval report: the q_nb_score pipeline + label join, then the
    // histogram-exact mid-rank AUC (2U = Σ np·(2·negs_below + nn)) and
    // confusion ratios as half-up integer micro snaps — HUGEINT
    // mirrors Spark's DECIMAL(38,0) `div`
    "q_classifier_calibration" -> calibrationOracleSql,
    "q_nb_eval" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
        |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
        |c AS (SELECT term,
        |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        | FROM tk GROUP BY term),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp, CAST(sum(n_neg) AS BIGINT) AS tn,
        |  count(*) AS v FROM c),
        |m AS (SELECT term,
        |  CAST(round((ln((n_pos + 1.0) / (tp + 1.0 * v)) - ln((n_neg + 1.0) / (tn + 1.0 * v))) * 1e6) AS BIGINT) AS lm
        | FROM c CROSS JOIN t),
        |oov AS (SELECT CAST(round((ln(tn + 1.0 * v) - ln(tp + 1.0 * v)) * 1e6) AS BIGINT) AS lo FROM t),
        |s AS (SELECT doc_id, CAST(sum(coalesce(m.lm, oov.lo)) AS BIGINT) AS score_micro
        | FROM tk LEFT JOIN m USING (term) CROSS JOIN oov GROUP BY doc_id),
        |lab AS (SELECT doc_id,
        |  CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS y FROM documents),
        |sc AS (SELECT s.doc_id, s.score_micro, lab.y FROM s JOIN lab USING (doc_id)),
        |h AS (SELECT score_micro AS sm, CAST(sum(y) AS BIGINT) AS np,
        |  CAST(sum(1 - y) AS BIGINT) AS nn FROM sc GROUP BY sm),
        |cc AS (SELECT sm, np, nn, coalesce(sum(nn) OVER (ORDER BY sm
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clt FROM h),
        |u AS (SELECT CAST(sum(CAST(np AS HUGEINT) * (clt * 2 + nn)) AS DECIMAL(38,0)) AS u2 FROM cc),
        |t2 AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
        |  CAST(sum(CASE WHEN sm > 0 THEN np ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN sm > 0 THEN nn ELSE 0 END) AS BIGINT) AS fp FROM h),
        |fin AS (SELECT n_pos, n_neg, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn, u2
        | FROM t2, u)
        |SELECT n_pos, n_neg, tp, fp, fn, tn, CAST(u2 AS DOUBLE) AS u2,
        | CAST(round(CAST(CASE WHEN tp + fp = 0 THEN NULL ELSE
        |   (CAST(tp AS HUGEINT) * 2000000 + (tp + fp)) // (CAST(tp + fp AS HUGEINT) * 2)
        |  END AS DOUBLE) / 1e6, 6) AS DOUBLE) AS "precision",
        | CAST(round(CAST(CASE WHEN n_pos = 0 THEN NULL ELSE
        |   (CAST(tp AS HUGEINT) * 2000000 + n_pos) // (CAST(n_pos AS HUGEINT) * 2)
        |  END AS DOUBLE) / 1e6, 6) AS DOUBLE) AS recall,
        | CAST(round(CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE
        |   (CAST(tp AS HUGEINT) * 4000000 + (2 * tp + fp + fn))
        |    // (CAST(2 * tp + fp + fn AS HUGEINT) * 2)
        |  END AS DOUBLE) / 1e6, 6) AS DOUBLE) AS f1,
        | CAST(round(CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
        |   (CAST(u2 AS HUGEINT) * 2000000 + CAST(n_pos AS HUGEINT) * n_neg * 2)
        |    // (CAST(n_pos AS HUGEINT) * n_neg * 4)
        |  END AS DOUBLE) / 1e6, 6) AS DOUBLE) AS auc
        |FROM fin""".stripMargin,
    "q_grep" ->
      s"""SELECT doc_id, CAST(strpos(lower(text), '$grepQuery') AS INTEGER) AS pos
         |FROM documents WHERE strpos(lower(text), '$grepQuery') > 0
         |ORDER BY doc_id""".stripMargin,
    // the index probe is an exact candidate superset + contains()
    // verify — output-identical by construction (spec), same oracle
    "q_grep_indexed" ->
      s"""SELECT doc_id, CAST(strpos(lower(text), '$grepQuery') AS INTEGER) AS pos
         |FROM documents WHERE strpos(lower(text), '$grepQuery') > 0
         |ORDER BY doc_id""".stripMargin,
    "q_audit_scan" -> auditOracleSql,
    // stateless stream == batch scan (spec-asserted) — same oracle
    "q_stream_audit_gate" -> auditOracleSql,
    "q_corpus_build" ->
      s"""WITH RECURSIVE $corpusBuildCte
         |SELECT doc_id, status,
         | CASE WHEN status = 'kept' THEN
         |   CASE WHEN bucket < 90 THEN 'train'
         |        WHEN bucket < 95 THEN 'val' ELSE 'test' END END AS split,
         | CASE WHEN status = 'kept' THEN shard END AS shard
         |FROM fin ORDER BY doc_id""".stripMargin,
    "q_corpus_build_report" ->
      s"""WITH RECURSIVE $corpusBuildCte
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
         |FROM fin GROUP BY status ORDER BY status""".stripMargin,
    "q_corpus_audit" ->
      s"""WITH RECURSIVE $corpusBuildCte
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(CASE WHEN status = 'dup_exact' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_exact,
         | CAST(sum(CASE WHEN status = 'dup_near' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_near,
         | CAST(sum(CASE WHEN status = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         | CAST(sum(CASE WHEN status = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         | CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST((sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) * 2000000 + count(*))
         |   // (count(*) * 2) AS BIGINT) AS kept_rate_micro
         |FROM fin JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_bm25_search" -> bm25OracleSql,
    // the serving path is output-identical by construction (spec
    // asserts bit-equality) — same oracle
    "q_bm25_indexed" -> bm25OracleSql,
    // the incremental-maintenance entry serves from the delta-merged
    // index; the full-corpus oracle IS the incremental == full proof
    "q_bm25_incremental" -> bm25OracleSql,
    // the stream-maintained index serves against the same full-corpus
    // BM25 oracle — stream == rebuild, proven by hash
    "q_stream_bm25" -> bm25OracleSql,
    // signed stream (adds + replaces + removals) == the same
    // full-corpus BM25 over the SURVIVING documents table — the hash
    // gate IS the removal-aware index == full-rebuild proof
    "q_stream_bm25_signed" -> bm25OracleSql,
    // exact phrase search: the relational phrase join in SQL — tokens
    // with 1-based subscripts on BOTH sides, so start = pos − qpos is
    // the same 0-based value Spark's posexplode yields; a true
    // occurrence at `start` is a start witnessed by ALL plen query
    // positions. Indexed form is output-identical (spec) — same oracle
    "q_phrase_search" -> phraseOracleSql,
    "q_phrase_indexed" -> phraseOracleSql,
    // the maintenance entries serve from the delta-merged positional
    // index; the full-corpus oracle IS the incremental/stream == full
    // rebuild proof
    "q_phrase_incremental" -> phraseOracleSql,
    "q_stream_phrase" -> phraseOracleSql,
    // signed stream (adds + replaces + removals) == the same
    // full-corpus phrase search over the SURVIVING documents table
    "q_stream_phrase_signed" -> phraseOracleSql,
    // the verbatim-decontamination pair shares one per-doc rollup of
    // the same witness cascade; indexed == online by construction
    "q_decontaminate_phrase" -> decontaminatePhraseOracleSql,
    "q_decontaminate_phrase_indexed" -> decontaminatePhraseOracleSql,
    "q_stream_phrase_gate" -> decontaminatePhraseOracleSql,
    "q_hard_negatives" -> {
      val cos = dr("list_dot_product(e2.v, q.v)/(e2.norm*q.norm)", 6)
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS norm
         | FROM embeddings),
         |cj AS (SELECT q.vec_id AS query_id, e2.vec_id AS vec_id, $cos AS cos_r
         | FROM n q, n e2
         | WHERE q.vec_id IN (0, 1, 2, 3) AND e2.vec_id <> q.vec_id),
         |f AS (SELECT * FROM cj WHERE cos_r < 0.8),
         |r AS (SELECT query_id, vec_id, cos_r, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos_r DESC, vec_id) AS rank FROM f)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
         | CAST(cos_r AS DOUBLE) AS cos_sim
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },
    // the CMS counter table is fully deterministic (md5-prefix row
    // hashes), so the sketch itself oracle-matches
    "q_cms_build" -> cmsBuildOracleSql,
    // the stream-maintained sketch must equal the direct build —
    // counts are linear, so the oracle is the SAME direct-build SQL
    "q_stream_cms" -> cmsBuildOracleSql,
    // ... and so do its point estimates: min over depth rows of the
    // deterministic counters — est >= exact by construction
    "q_cms_estimate" ->
      """WITH tk AS (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |ex AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS n_exact FROM tk GROUP BY t),
        |dd AS (SELECT t, unnest(range(0, 4)) AS d FROM tk),
        |cm AS (SELECT d,
        |  ('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || t), 1, 8))::UBIGINT::BIGINT % 1024 AS bucket,
        |  count(*) AS cnt
        | FROM dd GROUP BY 1, 2),
        |qb AS (SELECT term, r.d AS d,
        |  ('0x' || substr(md5('cms:' || CAST(r.d AS VARCHAR) || ':' || term), 1, 8))::UBIGINT::BIGINT % 1024 AS bucket
        | FROM ex, range(0, 4) AS r(d)),
        |est AS (SELECT term, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
        | FROM qb LEFT JOIN cm USING (d, bucket) GROUP BY term)
        |SELECT term, n_exact, est, est - n_exact AS err
        |FROM ex JOIN est USING (term) ORDER BY term""".stripMargin,
    "q_hybrid_search" -> {
      val cos = dr("list_dot_product(e2.v, q.v)/(e2.norm*q.norm)", 6)
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS norm
         | FROM embeddings),
         |cj AS (SELECT q.vec_id AS query_id, e2.vec_id AS doc_id, $cos AS cos_r
         | FROM n q, n e2 WHERE q.vec_id IN (0, 1, 2, 3)),
         |semr AS (SELECT query_id, doc_id, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos_r DESC, doc_id) AS rank FROM cj),
         |q(query_id, query_text) AS (
         |  SELECT doc_id, array_to_string(string_split(lower(text), ' ')[1:6], ' ')
         |  FROM documents WHERE doc_id IN (0, 1, 2, 3)),
         |$bm25CoreCtes,
         |lexr AS (SELECT query_id, doc_id, row_number() OVER
         |  (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank FROM sc),
         |ctr AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c
         |  FROM lexr WHERE rank <= 10
         | UNION ALL
         | SELECT query_id, doc_id, 1000000 // (60 + rank) FROM semr WHERE rank <= 10),
         |f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         |  CAST(count(*) AS INTEGER) AS n_branches FROM ctr GROUP BY 1, 2),
         |r2 AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rank FROM f)
         |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
         | doc_id, rrf_micro, n_branches
         |FROM r2 WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },
    "q_dsir_weights" ->
      """WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, source, unnest(w) AS f FROM t
        |      UNION ALL
        |      SELECT doc_id, source,
        |        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
        |      FROM t WHERE len(w) >= 2),
        |fb AS (SELECT doc_id, source,
        |  ('0x' || substr(md5('dsir-v1:' || f), 1, 8))::UBIGINT::BIGINT % 1024 AS b FROM f),
        |d AS (SELECT doc_id, source, b, count(*) AS c FROM fb GROUP BY 1, 2, 3),
        |rc AS (SELECT b, sum(c) AS cr FROM d GROUP BY 1),
        |tc AS (SELECT b, sum(c) AS ct FROM d WHERE source IN ('src0', 'src1') GROUP BY 1),
        |tot AS (SELECT (SELECT sum(ct) FROM tc) AS t, (SELECT sum(cr) FROM rc) AS r),
        |m AS (SELECT rc.b,
        |  CAST(round((ln((coalesce(ct, 0) + 1.0) / (coalesce(t, 0) + 1024))
        |      - ln((cr + 1.0) / (r + 1024))) * 1e6) AS BIGINT) AS lr_micro
        | FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN tot),
        |s AS (SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_feats,
        |  CAST(sum(c * lr_micro) AS BIGINT) AS wm
        | FROM d JOIN m ON d.b = m.b GROUP BY 1, 2)
        |SELECT doc_id, source, n_feats,
        | CAST(round(CAST(wm AS DOUBLE) / 1e6, 6) AS DOUBLE) AS log_weight,
        | wm > 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |   i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS grams
        | FROM d WHERE len(w) >= 5),
        |bg AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id < 25),
        |dg AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id >= 25),
        |hits AS (SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (gr) GROUP BY doc_id)
        |SELECT b.doc_id, coalesce(hits.n, 0) AS n_contaminated_grams,
        | coalesce(hits.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) b
        |LEFT JOIN hits USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_contamination_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |   i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS grams
        | FROM d WHERE len(w) >= 5),
        |bg AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id < 25),
        |dg AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id >= 25),
        |per AS (SELECT dg.doc_id, count(*) AS n_grams, count(bg.gr) AS n_overlap
        | FROM dg LEFT JOIN bg USING (gr) GROUP BY dg.doc_id)
        |SELECT b.doc_id,
        | CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
        | CAST(coalesce(per.n_overlap, 0) AS BIGINT) AS n_overlap,
        | CAST(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0
        |  ELSE (per.n_overlap * 2000000 + per.n_grams) // (per.n_grams * 2)
        |  END AS BIGINT) AS overlap_micro
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) b
        |LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // composed from the exact formulations of q_lang_id /
    // q_token_count / q_quality_score / q_repetition plus an exact-dup
    // window, so each stage's parity is already proven by its
    // standalone oracle
    "q_curation_pipeline" -> {
      def l(lang: String) = graft.operators.TextAnalysis.stopwords
        .find(_._1 == lang).get._2.map(w => s"'$w'").mkString("[", ", ", "]")
      val swList = graft.operators.TextAnalysis.stopwords.head._2
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents),
         |ls AS (SELECT doc_id,
         |  CAST(len(list_intersect(list_distinct(w), ${l("en")})) AS INTEGER) AS s_en,
         |  CAST(len(list_intersect(list_distinct(w), ${l("de")})) AS INTEGER) AS s_de,
         |  CAST(len(list_intersect(list_distinct(w), ${l("es")})) AS INTEGER) AS s_es,
         |  CAST(len(list_intersect(list_distinct(w), ${l("fr")})) AS INTEGER) AS s_fr,
         |  CAST(len(list_intersect(list_distinct(w), ${l("zh")})) AS INTEGER) AS s_zh
         | FROM t),
         |lang AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS predicted
         | FROM ls),
         |tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|\\S')) AS INTEGER) AS n_tokens
         | FROM documents),
         |qual AS (SELECT doc_id,
         |  (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
         |     / length(text) * 0.5
         |   + CAST(len(list_filter(w, t2 -> list_contains($swList, t2))) AS DOUBLE)
         |     / len(w) * 0.5 >= 0.3
         |   AND len(w) >= 10) AS q_keep
         | FROM t),
         |g AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gr
         | FROM t WHERE len(w) >= 2),
         |c AS (SELECT doc_id, gr, count(*) AS n FROM g GROUP BY 1, 2),
         |reps AS (SELECT doc_id, sum(n) AS total, max(n) AS top FROM c GROUP BY 1),
         |rep AS (SELECT doc_id,
         |  (top > 1 AND CAST(top AS DOUBLE)/total > 0.1) AS flagged FROM reps),
         |dup AS (SELECT doc_id,
         |  doc_id <> min(doc_id) OVER (PARTITION BY sha256(text)) AS is_dup FROM documents),
         |r AS (SELECT lang.doc_id, predicted, n_tokens,
         |  CASE WHEN predicted <> 'en' THEN 'lang'
         |       WHEN n_tokens < 20 OR n_tokens > 5000 THEN 'length'
         |       WHEN NOT q_keep THEN 'quality'
         |       WHEN coalesce(flagged, false) THEN 'repetition'
         |       WHEN is_dup THEN 'duplicate' END AS reason
         | FROM lang JOIN tok USING (doc_id) JOIN qual USING (doc_id)
         |  LEFT JOIN rep USING (doc_id) JOIN dup USING (doc_id))
         |SELECT doc_id, predicted AS lang_pred, n_tokens,
         | reason IS NULL AS keep, reason
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "q_cohort_pivot" ->
      """WITH fo AS (SELECT o_custkey,
        |  date_trunc('month', min(o_orderdate)) AS cohort_month
        | FROM orders GROUP BY o_custkey),
        |j AS (SELECT o.o_custkey, CAST(fo.cohort_month AS TIMESTAMP) AS cohort_month,
        |  (date_part('year', o.o_orderdate)*12 + date_part('month', o.o_orderdate))
        |   - (date_part('year', fo.cohort_month)*12 + date_part('month', fo.cohort_month)) AS months_after
        | FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey)
        |SELECT cohort_month,
        | count(DISTINCT CASE WHEN months_after = 0 THEN o_custkey END) AS m0,
        | count(DISTINCT CASE WHEN months_after = 1 THEN o_custkey END) AS m1,
        | count(DISTINCT CASE WHEN months_after = 2 THEN o_custkey END) AS m2,
        | count(DISTINCT CASE WHEN months_after = 3 THEN o_custkey END) AS m3,
        | count(DISTINCT CASE WHEN months_after = 4 THEN o_custkey END) AS m4,
        | count(DISTINCT CASE WHEN months_after = 5 THEN o_custkey END) AS m5
        |FROM j GROUP BY cohort_month ORDER BY cohort_month""".stripMargin,
    "q_price_histogram" ->
      s"""SELECT CASE WHEN p_retailprice < 900.0 THEN 0
         |      WHEN p_retailprice >= 2100.0 THEN 13
         |      ELSE CAST(floor((p_retailprice - 900.0) / (2100.0 - 900.0) * 12) AS BIGINT) + 1
         |      END AS bucket,
         | count(*) AS n_products,
         | ${m("min(p_retailprice)")} AS min_price,
         | ${m("max(p_retailprice)")} AS max_price
         |FROM part GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_session_window" ->
      s"""WITH flagged AS (
         | SELECT user_id, event_id, ts, value,
         |  CASE WHEN lag(ts) OVER w IS NULL
         |        OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
         | FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         | SELECT user_id, ts, value,
         |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS session_seq
         | FROM flagged)
         |SELECT user_id,
         | CAST(min(ts) AS TIMESTAMP) AS session_start,
         | CAST(max(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
         | count(*) AS n_events,
         | ${sSum("value", 2)} AS total_value
         |FROM numbered GROUP BY user_id, session_seq
         |ORDER BY user_id, session_start""".stripMargin,
    // the streaming run emits the identical session set (sentinel-
    // flushed append mode), so it shares the batch oracle verbatim
    "q_stream_session_window" ->
      s"""WITH flagged AS (
         | SELECT user_id, event_id, ts, value,
         |  CASE WHEN lag(ts) OVER w IS NULL
         |        OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
         | FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         | SELECT user_id, ts, value,
         |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS session_seq
         | FROM flagged)
         |SELECT user_id,
         | CAST(min(ts) AS TIMESTAMP) AS session_start,
         | CAST(max(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
         | count(*) AS n_events,
         | ${sSum("value", 2)} AS total_value
         |FROM numbered GROUP BY user_id, session_seq
         |ORDER BY user_id, session_start""".stripMargin,
    "q_retention_cohorts" ->
      """WITH fo AS (SELECT o_custkey,
        |  date_trunc('month', min(o_orderdate)) AS cohort_month
        | FROM orders GROUP BY o_custkey)
        |SELECT CAST(fo.cohort_month AS TIMESTAMP) AS cohort_month,
        | CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS activity_month,
        | count(DISTINCT o.o_custkey) AS n_active_customers,
        | count(*) AS n_orders
        |FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
        |GROUP BY 1, 2 ORDER BY cohort_month, activity_month""".stripMargin,
    "q_price_percentiles" ->
      s"""SELECT p_type AS category,
         | ${m("quantile_cont(p_retailprice, 0.5)")} AS p50_price,
         | ${m("quantile_cont(p_retailprice, 0.9)")} AS p90_price
         |FROM part GROUP BY p_type ORDER BY category""".stripMargin,
  ) ++ pcaOracleSqlEntry ++ mixTempOracleSqlEntry

  /** The last temperature-rate table served (set by the
    * q_mix_temperature entry — Verify runs queries before dumping
    * oracle_sql.json, the [[pcaOracleModel]] pattern). */
  @volatile private var mixTempOracleRates:
    Option[Seq[(String, Long, Long, Long)]] = None

  /** q_mix_temperature's FULL oracle: the per-source INTEGER
    * micro-rates the Spark plan consumed ride the SQL as literals —
    * the single pow(n, α) micro-snap ran once on the driver
    * (Curation.mixTemperatureRates), so neither engine's libm is
    * trusted to agree with the other's at a .5 rounding boundary.
    * Only the shared md5 acceptance and integer comparisons replay. */
  private def mixTempOracleSqlEntry: Map[String, String] =
    mixTempOracleRates.toList.map { rates =>
      val rows = rates.map { case (s, _, _, r) =>
        s"('${operators.Expectations.sqlLit(s)}', CAST($r AS BIGINT))"
      }.mkString(",\n ")
      "q_mix_temperature" ->
        s"""WITH d0 AS (SELECT doc_id,
           |  CASE WHEN doc_id % 10 < 7 THEN 'head'
           |       WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS source
           | FROM documents),
           |r(source, r_micro) AS (VALUES
           | $rows),
           |kept AS (SELECT d.source, d.doc_id, r.r_micro
           | FROM d0 d JOIN r USING (source)
           | WHERE ('0x' || substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           |     * 1000000 < CAST(r_micro AS HUGEINT) * 4294967296)
           |SELECT source, min(r_micro) AS r_micro, count(*) AS n_docs,
           | min(doc_id) AS first_doc
           |FROM kept GROUP BY source ORDER BY source""".stripMargin
    }.toMap

  /** q_embed_pca's FULL oracle: the projection from a trained model is
    * just dot products, so the model's components (and the folded μ·v
    * offsets) ride the SQL as literals — Scala's Double.toString is
    * the shortest round-trip repr, so DuckDB parses the IDENTICAL
    * doubles the Spark plan folded, and the sequential
    * list_dot_product matches graft_dot's summation order bit-for-bit.
    * Present only once a model has been trained this process (Verify
    * runs queries before dumping oracle_sql.json). */
  private def pcaOracleSqlEntry: Map[String, String] =
    pcaOracleModel.toList.map { pm =>
      def arr(xs: Array[Double]) = xs.mkString("[", ", ", "]")
      val rows = pm.comps.zipWithIndex.map { case (comp, c) =>
        val off = comp.zip(pm.mean).map { case (a, b) => a * b }.sum
        s"(CAST($c AS INTEGER), CAST(${arr(comp)} AS DOUBLE[]), CAST($off AS DOUBLE))"
      }.mkString(",\n ")
      "q_embed_pca" ->
        s"""WITH pcam(dim, comp, off) AS (VALUES
           | $rows),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
           |SELECT e.vec_id, pcam.dim,
           | CAST(${dr("list_dot_product(e.v, pcam.comp) - pcam.off", 6)} AS DOUBLE) AS value
           |FROM e CROSS JOIN pcam
           |ORDER BY vec_id, dim""".stripMargin
    }.toMap
}
