package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the classic pre-transform of a
  * vector-index pipeline (FAISS's PCAMatrix/OPQ stage: rotate/reduce
  * before quantizing so the index codes the directions that carry
  * variance). The Spark shape follows the repo's FAISS-style train/add
  * split ([[Similarity.ivfTrainingSample]]): the covariance is
  * estimated on a BOUNDED deterministic sample and eigensolved on the
  * driver (d = 64 → a 64×64 cyclic Jacobi, microseconds), and the
  * expensive part — projecting the corpus — is a NARROW map where the
  * mean and components ride the plan as literals through the codegen
  * `graft_dot` kernel. No shuffle anywhere: training cost is
  * sample×d², serving cost is corpus×k×d on idle cores.
  *
  * Determinism: the sample is xxhash64-rank order (no RNG), Jacobi
  * rotations are a fixed sweep order, and each projection is a fixed
  * per-row summation — the operator is bit-reproducible for a given
  * data version, and the model persists as a tiny parquet artifact.
  * Sign convention: each component's largest-|coordinate| entry is
  * made non-negative, so eigenvector sign (mathematically arbitrary)
  * cannot flip between runs or runtimes. */
object Pca {

  case class PcaModel(
      mean: Array[Double],
      eigvals: Array[Double],        // descending, length k
      comps: Array[Array[Double]])   // k × d, row c = component c

  /** Cyclic Jacobi eigensolver for a symmetric matrix (in-place on a
    * copy): returns (eigenvalues, eigenvectors as columns). */
  private[operators] def jacobiEigen(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-16) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Train on the deterministic bounded sample; returns the top-k
    * model with sign-fixed components. */
  def pcaTrain(emb: DataFrame, k: Int = 8, maxTrain: Int = 4096): PcaModel = {
    val sample = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxTrain)
      .select(col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pcaTrain: empty embedding table")
    val d = sample.head.length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val n = sample.length.toDouble
    val mean = new Array[Double](d)
    for (x <- sample; j <- 0 until d) mean(j) += x(j) / n
    val cov = Array.ofDim[Double](d, d)
    for (x <- sample) {
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          cov(i)(j) += (x(i) - mean(i)) * (x(j) - mean(j)) / n
          j += 1
        }
        i += 1
      }
    }
    for (i <- 0 until d; j <- 0 until i) cov(i)(j) = cov(j)(i)
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(k)
    val comps = order.map { case (_, c) =>
      val comp = Array.tabulate(d)(j => vecs(j)(c))
      // sign fix: largest-|entry| coordinate non-negative
      val m = comp.indices.maxBy(j => (math.abs(comp(j)), -j))
      if (comp(m) < 0) comp.map(-_) else comp
    }
    PcaModel(mean, order.map(_._1), comps)
  }

  /** The persistable model artifact: row idx −1 carries the mean,
    * rows 0..k−1 carry (eigval, component). */
  def pcaModelFrame(spark: SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    ((-1, 0.0, model.mean.toSeq) +:
      model.comps.indices.map(c =>
        (c, model.eigvals(c), model.comps(c).toSeq)))
      .toDF("idx", "eigval", "vec")
  }

  /** Rehydrate a model from its artifact frame. */
  def pcaModelFromFrame(df: DataFrame): PcaModel = {
    val rows = df.orderBy("idx").collect()
    require(rows.nonEmpty && rows.head.getInt(0) == -1,
      "pcaModelFromFrame: artifact is missing the mean row (idx = -1)")
    val mean = rows.head.getSeq[Double](2).toArray
    val comps = rows.tail.map(_.getSeq[Double](2).toArray)
    PcaModel(mean, rows.tail.map(_.getDouble(1)), comps)
  }

  /** Checker-safe exploded projection: (vec_id, dim, value) with the
    * value snapped to 6 decimals — every column atomic, so a
    * sort-before-hash checker (pandas, DuckDB) can canonicalize it.
    * Bit-equal to `round(pcaProject(...).proj[dim], 6)` (asserted in
    * PcaSpec); since each value is one literal-model dot product,
    * this form is also DuckDB-expressible and carries a FULL oracle. */
  def pcaProjectExploded(emb: DataFrame, model: PcaModel): DataFrame =
    pcaProject(emb, model)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
      .select(col("vec_id"), col("dim"), round(col("value"), 6).as("value"))
      .orderBy("vec_id", "dim")

  /** Project the corpus: (vec_id, proj array<double> of length k) —
    * narrow map, literals-only model, codegen dot products. */
  def pcaProject(emb: DataFrame, model: PcaModel): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val vd = col("embedding").cast("array<double>")
    val projCols = model.comps.zipWithIndex.map { case (comp, c) =>
      // dot(x − μ, v) = dot(x, v) − dot(μ, v): the μ·v offset is a
      // plain literal, so the per-row work is ONE codegen dot product
      val offset = comp.zip(model.mean).map { case (a, b) => a * b }.sum
      call_udf("graft_dot", col("vd"), typedlit(comp.toSeq)) - lit(offset)
    }
    emb.select(col("vec_id"), vd.as("vd"))
      .select(col("vec_id"), array(projCols: _*).as("proj"))
      .orderBy("vec_id")
  }
}
