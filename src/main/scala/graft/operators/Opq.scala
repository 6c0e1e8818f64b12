package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parametric OPQ (Ge et al. 2013, "Optimized Product Quantization",
  * §5 — the closed-form solution FAISS ships as OPQMatrix's Gaussian
  * initialization): an orthogonal pre-rotation for the PQ family that
  * (a) decorrelates coordinates via PCA and (b) permutes the rotated
  * dimensions so every PQ subspace receives a BALANCED share of the
  * variance (eigenvalue allocation — greedily assign each
  * eigen-dimension, largest first, to the non-full subspace with the
  * smallest eigenvalue log-product). Flat PQ splits raw contiguous
  * coordinates, so with anisotropic embeddings one subspace hoards the
  * variance while others quantize noise; the rotation spends the same
  * (m × nCodes) code budget where the structure is. Deterministic end
  * to end: the PCA stage is [[Pca.pcaTrain]]'s hash-rank-sampled,
  * sign-fixed Jacobi; allocation ties break on subspace index.
  *
  * The rotation is PURE (no mean shift): it preserves dot products and
  * norms, so cosine scores in rotated space equal the original scores
  * and the exact-rerank tail needs no inverse transform. Applying it
  * is a NARROW map — one codegen graft_dot per output dimension, the
  * [[Pca.pcaProject]] literals posture; the d×d matrix rides the plan
  * as literals and persists as a ≤ d-row parquet artifact. */
object Opq {

  /** Rotation rows in OUTPUT order (row i = the unit vector whose dot
    * with the input becomes rotated coordinate i; PQ subspace s owns
    * rows s·d/m .. (s+1)·d/m − 1), plus the eigenvalue each row
    * carries (diagnostic — the per-subspace balance). */
  case class OpqModel(rows: Array[Array[Double]], eigvals: Array[Double])

  /** Train the parametric rotation on (vec_id, embedding): full-d PCA
    * on the bounded deterministic sample, then eigenvalue allocation
    * into m balanced subspaces. `emb` should carry the vectors the PQ
    * stage will quantize (the caller passes NORMALIZED vectors when
    * the index is cosine — the variance structure being balanced must
    * be the quantized one's).
    *
    * `outDim` < d opts into FAISS's `OPQ<M>_<outdim>` shape: keep only
    * the top `outDim` eigen-directions before allocating — a
    * rotation-PLUS-projection, so the PQ stage quantizes a smaller
    * input at the same code budget. Dot products are preserved only
    * within the retained subspace (the dropped directions carry the
    * tail eigenvalue mass), so a reduced index must exact-rerank its
    * survivor pool in ORIGINAL space — [[graft.operators.Similarity
    * .embedOpqPqTopK]] does exactly that. */
  def opqTrain(
      emb: DataFrame, m: Int, maxTrain: Int = 4096,
      outDim: Int = -1): OpqModel = {
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    val kept = if (outDim <= 0) d else outDim
    require(m >= 1 && kept % m == 0 && kept <= d,
      s"OPQ requires outDim ($kept) divisible by m ($m) and <= dim ($d)")
    val full = Pca.pcaTrain(emb, k = kept, maxTrain = maxTrain)
    val capacity = kept / m
    val sizes = new Array[Int](m)
    val logPow = new Array[Double](m)
    val buckets = Array.fill(m)(Vector.newBuilder[Int])
    // guard log(0): a rank-deficient tail contributes a floor, not -inf
    val logs = full.eigvals.map(v => math.log(math.max(v, 1e-300)))
    // Ge et al.'s greedy implicitly assumes eigenvalues ≥ 1 (true for
    // raw SIFT energies, FALSE after unit-normalization, where the
    // trace — hence every eigenvalue — is < 1): with all logs
    // negative, "min log-product" keeps pointing at whichever bucket
    // already took a value, piling the entire signal into subspace 0 —
    // the exact degenerate split OPQ exists to fix. Shifting every log
    // by the minimum makes items non-negative WITHOUT changing the
    // final balance objective (all buckets end at equal cardinality,
    // so the shift adds the same constant to every complete bucket),
    // and makes the allocation invariant to rescaling the corpus.
    val shift = logs.min
    // eigvals descend (pcaTrain contract): place each eigen-dimension
    // into the emptiest-variance subspace that still has room
    for (i <- 0 until kept) {
      val b = (0 until m).filter(sizes(_) < capacity)
        .minBy(b => (logPow(b), b))
      buckets(b) += i
      sizes(b) += 1
      logPow(b) += logs(i) - shift
    }
    val order = buckets.flatMap(_.result())
    OpqModel(order.map(full.comps), order.map(full.eigvals))
  }

  /** The rotated vector as a Column: one codegen dot per output dim,
    * matrix folded as plan literals (callers must have registered
    * graft_dot — [[graft.functions.VectorFunctions.register]]). */
  def rotateCol(v: Column, model: OpqModel): Column =
    array(model.rows.map(r => call_udf("graft_dot", v, typedlit(r.toSeq))): _*)

  /** Persistable artifact frame: (idx, eigval, vec) in output order. */
  def opqModelFrame(spark: SparkSession, model: OpqModel): DataFrame = {
    import spark.implicits._
    model.rows.indices
      .map(i => (i, model.eigvals(i), model.rows(i).toSeq))
      .toDF("idx", "eigval", "vec")
  }

  /** Rehydrate a model from its artifact frame. */
  def opqModelFromFrame(df: DataFrame): OpqModel = {
    val rows = df.orderBy("idx").collect()
    require(rows.nonEmpty, "opqModelFromFrame: empty artifact")
    OpqModel(
      rows.map(_.getSeq[Double](2).toArray),
      rows.map(_.getDouble(1)))
  }
}
