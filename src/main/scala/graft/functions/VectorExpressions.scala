package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two double arrays.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` — evaluates interpreted lambda closures per
  * element (~100ns each), which dominates brute-force similarity scans.
  * This expression is a tight codegen'd loop over the unsafe array data
  * (left-to-right accumulation, bit-identical to the sequential fold it
  * replaces). Null if either side is null; arrays shorter side bounds
  * the loop.
  *
  * `foldCompat = true` (used only by [[RewriteDotProduct]]) instead
  * reproduces the lambda fold's semantics exactly: NULL when the
  * lengths differ (zip_with would null-pad) and NULL when any element
  * is null. Each operand is still evaluated exactly once, and the
  * per-element null checks are only generated when an input's type can
  * actually contain nulls, so null-free hot paths keep the tight loop
  * either way.
  */
case class DotProduct(left: Expression, right: Expression,
    foldCompat: Boolean = false) extends BinaryExpression {

  // Callers pass array<double> (built via an explicit CAST); no
  // ExpectsInputTypes because AbstractDataType is private[sql] in 4.x.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = super.nullable || foldCompat

  @transient private lazy val mayHaveNullElements: Boolean = foldCompat &&
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (foldCompat && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    if (mayHaveNullElements) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val loop =
        s"""
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
         """.stripMargin
      // ev.isNull's variable exists only when `nullable` — when it is
      // false, nullSafeCodeGen emits NO isNull declaration and any
      // reference to it is an undeclared identifier: Janino rejects
      // the class and the whole stage silently falls back to
      // interpreted eval. The null-free hot path must not mention it.
      val guarded = if (!nullable) loop else {
        val lengthCheck = if (foldCompat) {
          s"if ($a.numElements() != $b.numElements()) ${ev.isNull} = true;"
        } else ""
        val nullCheck = if (mayHaveNullElements) {
          s"""
             |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
             |  if ($a.isNullAt($i) || $b.isNullAt($i)) ${ev.isNull} = true;
             |}
           """.stripMargin
        } else ""
        s"""
           |$lengthCheck
           |$nullCheck
           |if (!${ev.isNull}) {
           |  $loop
           |}
         """.stripMargin
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |$guarded
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC (asymmetric distance computation) lookup for product-quantized
  * codes (Jégou et al. 2011 §IV — the scoring kernel of FAISS
  * IndexPQ): `graft_pq_adc(codes, lut)` = Σ_s lut\[s\]\[codes\[s\]−1\].
  * `codes` is the corpus side's m 1-based sub-centroid ids
  * (array<tinyint>); `lut` the query side's per-subspace partial-dot
  * table (array<array<double>>, sub-ordered, index c−1 holds centroid
  * c's partial). NULL on ragged inputs, a null element, or an
  * out-of-range code, so a codebook/code mismatch fails loudly
  * instead of scoring garbage. Keeps the hot PQ scan inside
  * whole-stage codegen — a `zip_with`/`aggregate` lambda formulation
  * would interpret m closure calls per row. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  // reject wrong widths at analysis time: ArrayData.getByte on an
  // int/long array would silently misread raw bytes, not throw
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<TINYINT>, ARRAY<ARRAY<DOUBLE>>), " +
            s"got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != lut.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i) || lut.isNullAt(i)) return null
      val row = lut.getArray(i)
      val c = codes.getByte(i).toInt - 1
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      s += row.getDouble(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = $a.numElements();
         |double $s = 0.0;
         |if ($m != $b.numElements()) ${ev.isNull} = true;
         |for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |  int $c = ((int) $a.getByte($i)) - 1;
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $s += $row.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native multi-table random-hyperplane LSH bucketing over a double
  * vector: returns one `planes`-bit sign bucket per table as
  * array<long> (element l = table l's bucket).
  *
  * Hyperplane coefficients are derived from
  * `pmod(xxhash64_int((l*planes + j)*64 + i), 1000)/1000 - 0.5` — the
  * exact values the previous SQL-lambda formulation produced
  * (`aggregate(sequence(...))` over `xxhash64`), so buckets are
  * bit-compatible, but evaluated as a tight codegen loop over a
  * precomputed coefficient table instead of tables×planes×dim
  * interpreted closure calls per row (the cost graft_dot's scaladoc
  * warns about — measured 27× on the LSH top-k path).
  *
  * Coefficients for dims < 64 come from the precomputed table; the
  * i ≥ 64 tail (not hit by the 64-dim test corpus) falls back to
  * hashing inline, keeping the function total for any input width.
  * CAVEAT for vectors wider than 64 dims: the flat hash input
  * `(l*planes + j)*64 + i` aliases into plane j+1's coefficient range
  * once i ≥ 64 (plane j's dim-64 coefficient equals plane j+1's dim-0
  * coefficient), so adjacent planes are partially correlated and
  * recall-per-table degrades vs truly independent hyperplanes. This is
  * kept deliberately: it is bit-compatible with the lambda formulation
  * the expression replaced (asserted in spec). If >64-dim corpora ever
  * matter, stride the hash input by a larger max-dim constant instead —
  * a bucket-format change that invalidates persisted bucket tables.
  * Bit-compatibility holds for null-free arrays (the only shape the
  * operators produce); null slots contribute nothing to the
  * projection instead of null-propagating like the lambda form.
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh"

  private val maxDim = 64

  // flat [(l*planes + j)*64 + i] — the flat index IS the hash input
  @transient private lazy val coefs: Array[Double] = {
    val arr = new Array[Double](tables * planes * maxDim)
    var idx = 0
    while (idx < arr.length) {
      arr(idx) = HyperplaneBuckets.coefAt(idx)
      idx += 1
    }
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var l = 0
    while (l < tables) {
      var code = 0L
      var j = 0
      while (j < planes) {
        val base = (l * planes + j) * 64
        var s = 0.0
        var i = 0
        val bound = math.min(dim, maxDim)
        // null slots contribute nothing (the pipelines never produce
        // them; guarded so arbitrary user arrays cannot NPE)
        while (i < bound) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * coefs(base + i)
          i += 1
        }
        while (i < dim) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * HyperplaneBuckets.coefAt(base + i)
          i += 1
        }
        code = code * 2 + (if (s > 0.0) 1L else 0L)
        j += 1
      }
      out(l) = code
      l += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val coefRef = ctx.addReferenceObj("lshCoefs", coefs, "double[]")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val code = ctx.freshName("code")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val bound = ctx.freshName("bound")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val l = ctx.freshName("l")
      val companion = HyperplaneBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $dim = $v.numElements();
         |long[] $out = new long[$tables];
         |for (int $l = 0; $l < $tables; $l++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    int $base = ($l * $planes + $j) * 64;
         |    double $s = 0.0;
         |    int $bound = $dim < $maxDim ? $dim : $maxDim;
         |    int $i = 0;
         |    for (; $i < $bound; $i++) {
         |      if (!$v.isNullAt($i)) $s += $v.getDouble($i) * $coefRef[$base + $i];
         |    }
         |    for (; $i < $dim; $i++) {
         |      if (!$v.isNullAt($i)) $s += $v.getDouble($i) * $companion.coefAt($base + $i);
         |    }
         |    $code = $code * 2L + ($s > 0.0 ? 1L : 0L);
         |  }
         |  $out[$l] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Coefficient for flat plane/dim index — mirrors Spark's
    * `xxhash64(<int literal>)` (XXH64.hashInt, seed 42). */
  def coefAt(idx: Int): Double = {
    val h = XXH64.hashInt(idx, 42L)
    val m = ((h % 1000L) + 1000L) % 1000L
    m / 1000.0 - 0.5
  }
}

/** One-permutation MinHash signature (Li et al., NIPS 2012) with
  * circular densification, as a single narrow per-row expression:
  * `graft_minhash(shingle_hashes, doc_id, k)` → array<long> of k slot
  * minima.
  *
  * Bit-identical to the relational formulation it replaces —
  * `groupBy(doc, pmod(h, k)).agg(min(h))` + map re-assembly +
  * `coalesce(m[j], m[(j+1)%k], m[(j+2)%k], m[(j+3)%k],
  * xxhash64(doc_id, j))` — asserted in VectorExpressionsSpec. The
  * relational version shuffles |docs|·k slot rows TWICE (slot-min agg,
  * then signature re-assembly); this expression computes the signature
  * where the shingles already are, so signature construction costs zero
  * shuffles at any corpus size.
  */
case class MinHashSignature(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(sh: Any, docId: Any): Any = {
    val hs = sh.asInstanceOf[ArrayData]
    // interpreted eval must widen like the codegen path does (an
    // integer doc_id arrives as java.lang.Integer, e.g. under
    // constant folding)
    val id = docId.asInstanceOf[Number].longValue()
    val mins = Array.fill(k)(Long.MaxValue)
    val filled = new Array[Boolean](k)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        val j = (((h % k) + k) % k).toInt
        if (!filled(j) || h < mins(j)) { mins(j) = h; filled(j) = true }
      }
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      var v = 0L
      var found = false
      var o = 0
      while (o <= 3 && !found) {
        val jj = (j + o) % k
        if (filled(jj)) { v = mins(jj); found = true }
        o += 1
      }
      sig(j) = if (found) v else XXH64.hashInt(j, XXH64.hashLong(id, 42L))
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, id) => {
      val mins = ctx.freshName("mins")
      val filled = ctx.freshName("filled")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val jj = ctx.freshName("jj")
      val o = ctx.freshName("o")
      val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$k];
         |boolean[] $filled = new boolean[$k];
         |int $n = $sh.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($sh.isNullAt($i)) continue;
         |  long $h = $sh.getLong($i);
         |  int $j = (int) ((($h % $k) + $k) % $k);
         |  if (!$filled[$j] || $h < $mins[$j]) { $mins[$j] = $h; $filled[$j] = true; }
         |}
         |long[] $sig = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $v = 0L; boolean $found = false;
         |  for (int $o = 0; $o <= 3 && !$found; $o++) {
         |    int $jj = ($j + $o) % $k;
         |    if ($filled[$jj]) { $v = $mins[$jj]; $found = true; }
         |  }
         |  $sig[$j] = $found ? $v : $xxh.hashInt($j, $xxh.hashLong($id, 42L));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash fingerprint over an array of tokens as a single
  * narrow expression: `graft_simhash(tokens)` → long.
  *
  * Hashes each token with Spark's xxhash64 semantics
  * (XXH64.hashUTF8String, seed 42), votes ±1 per bit, sets fingerprint
  * bits where the vote is positive — bit-identical to the relational
  * formulation (explode → 64 conditional-sum aggregates → bitwise
  * re-assembly, asserted in spec) but with zero shuffles: the
  * relational path pushed the entire exploded token stream through a
  * 64-column hash aggregation. Null tokens cast no votes (split()
  * never produces them; guarded for arbitrary user arrays).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      // null tokens cast no votes (split() never yields them; guarded
      // so arbitrary user arrays cannot NPE)
      if (!toks.isNullAt(i)) {
        val h = XXH64.hashUTF8String(toks.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >> (63 - j)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << (63 - j))
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val fp = ctx.freshName("fp")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $votes = new int[64];
         |int $n = $toks.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($toks.isNullAt($i)) continue;
         |  long $h = $xxh.hashUTF8String($toks.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >> (63 - $j)) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << (63 - $j));
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed word n-grams as a single narrow expression:
  * `graft_grams(words, n, dedup)` → array<long> of
  * xxhash64(space-joined n-gram) for every window, optionally
  * first-occurrence-deduplicated (array_distinct semantics).
  *
  * Bit-identical to the composable
  * `transform(sequence(1, size(w)-(n-1)), i -> xxhash64(concat_ws(' ',
  * slice(w, i, n))))` (+ array_distinct) — asserted in spec — but that
  * form evaluates an interpreted lambda per window and rebuilds the
  * joined string through generic codepaths; this is the hottest per-row
  * map of the dedup/fingerprint/decontamination family at corpus
  * scale. Fewer than n words → empty array (callers filter first).
  * Null words are skipped inside a window exactly as concat_ws skips
  * null inputs.
  */
case class WordGramHashes(child: Expression, n: Int, dedup: Boolean)
    extends UnaryExpression {

  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val space = WordGramHashes.separator
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val buf = new Array[Long](m - n + 1)
    var cnt = 0
    val seen = if (dedup) new java.util.HashSet[java.lang.Long]() else null
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      val joined = org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*)
      val h = XXH64.hashUTF8String(joined, 42L)
      if (seen == null || seen.add(h)) { buf(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  // NOTE: generated Java must stay generics-free — Janino (Spark's
  // runtime compiler) rejects type arguments, and a codegen compile
  // failure silently degrades the whole stage to interpreted eval.
  // Primitive buffer + raw HashSet only.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val m = ctx.freshName("m")
      val window = ctx.freshName("window")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val seen = ctx.freshName("seen")
      val sep = ctx.freshName("sep")
      val joined = ctx.freshName("joined")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val xxh = classOf[XXH64].getName
      val dedupDecl = if (dedup) s"java.util.HashSet $seen = new java.util.HashSet();" else ""
      val addCond =
        if (dedup) s"if ($seen.add(java.lang.Long.valueOf($h))) { $buf[$cnt++] = $h; }"
        else s"$buf[$cnt++] = $h;"
      // hoisted once per operator: separator as a reference object, the
      // window buffer as mutable state — no per-row allocation
      val sepRef = ctx.addReferenceObj("gramSep", WordGramHashes.separator, utf8)
      val windowState = ctx.addMutableState(s"$utf8[]", window,
        v => s"$v = new $utf8[$n];")
      s"""
         |int $m = $words.numElements();
         |long[] $buf = new long[$m >= $n ? $m - $n + 1 : 0];
         |int $cnt = 0;
         |$dedupDecl
         |$utf8 $sep = $sepRef;
         |for (int $i = 0; $i + $n <= $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $windowState[$j] = $words.isNullAt($i + $j) ? null : $words.getUTF8String($i + $j);
         |  }
         |  $utf8 $joined = $utf8.concatWs($sep, $windowState);
         |  long $h = $xxh.hashUTF8String($joined, 42L);
         |  $addCond
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramHashes {
  /** Shared single-space separator (UTF8String is immutable). */
  val separator: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")
}

/** Sliding-window minima over a long array — the winnowing selection
  * step of document fingerprinting: output[i] = min(input[i..i+w-1]),
  * length max(0, n-w+1).
  *
  * Bit-identical to the composable `transform(sequence(1, size(h)-w+1),
  * i -> array_min(slice(h, i, w)))` (asserted in spec), but that form
  * evaluates an interpreted lambda per window and rescans w elements
  * each time — O(n·w) generic calls per document. This is a codegen'd
  * monotonic-deque pass: O(n) amortized, each element enters and
  * leaves the deque once. Element-nullable inputs are ACCEPTED at
  * analysis time — parquet-sourced BIGINT arrays are element-nullable
  * by default even when no element is actually null — but an actual
  * null element fails LOUDLY at runtime (the deque reads raw long
  * slots, which would otherwise decode a null as garbage silently). */
case class SlidingMinima(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, "window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
    }

  private def nullElementError(): Nothing =
    throw new IllegalArgumentException(SlidingMinima.nullElementMessage)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val outLen = if (m >= window) m - window + 1 else 0
    val out = new Array[Long](outLen)
    val dq = new Array[Int](if (m > 0) m else 1)
    var head = 0
    var tail = 0
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) nullElementError()
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - window) head += 1
      if (i >= window - 1) out(i - window + 1) = a.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  // Janino-safe: primitives only, no generics (see WordGramHashes note)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val outLen = ctx.freshName("outLen")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $m = $arr.numElements();
         |int $outLen = $m >= $window ? $m - $window + 1 : 0;
         |long[] $out = new long[$outLen];
         |int[] $dq = new int[$m > 0 ? $m : 1];
         |int $head = 0;
         |int $tail = 0;
         |for (int $i = 0; $i < $m; $i++) {
         |  ${if (child.dataType.asInstanceOf[ArrayType].containsNull)
             s"""if ($arr.isNullAt($i)) throw new IllegalArgumentException("${SlidingMinima.nullElementMessage}");"""
           else ""}
         |  long $v = $arr.getLong($i);
         |  while ($tail > $head && $arr.getLong($dq[$tail - 1]) >= $v) $tail--;
         |  $dq[$tail++] = $i;
         |  if ($dq[$head] <= $i - $window) $head++;
         |  if ($i >= $window - 1) $out[$i - $window + 1] = $arr.getLong($dq[$head]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SlidingMinima {
  /** Shared by the interpreted path and (as an inlined Java string
    * literal) the generated code — keep it free of characters that
    * need Java escaping. */
  val nullElementMessage: String =
    "graft_winnow: null array element (filter nulls out with " +
      "array_compact or filter(x, x -> x IS NOT NULL))"
}

/** Registration for graft's native SQL functions. */
object VectorFunctions {
  private def intArg(e: Expression): Int = e.eval() match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"graft function expected an integer literal argument, got: $other")
  }

  private def boolArg(e: Expression): Boolean = e.eval() match {
    case b: java.lang.Boolean => b.booleanValue()
    case other => throw new IllegalArgumentException(
      s"graft function expected a boolean literal argument, got: $other")
  }

  private def bytesArg(e: Expression): Array[Byte] = e.eval() match {
    case b: Array[Byte] => b
    case other => throw new IllegalArgumentException(
      s"graft function expected a binary literal argument, got: $other")
  }

  /** (name, implementing class, builder) for every native function —
    * single source of truth for BOTH registration paths (session-level
    * register() and GraftExtensions injection), so argument coercion
    * can never drift between them. */
  private[functions] val builders
      : Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("graft_pq_adc", classOf[PqAdc],
      (exprs: Seq[Expression]) => PqAdc(exprs(0), exprs(1))),
    ("graft_nfc", classOf[NfcNormalize],
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)),
    ("graft_sample", classOf[BottomKByHash],
      (exprs: Seq[Expression]) => BottomKByHash(exprs(0), intArg(exprs(1)))),
    ("graft_lsh", classOf[HyperplaneBuckets],
      (exprs: Seq[Expression]) =>
        HyperplaneBuckets(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    ("graft_minhash", classOf[MinHashSignature],
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs(0), exprs(1), intArg(exprs(2)))),
    ("graft_simhash", classOf[SimHash64],
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    ("graft_grams", classOf[WordGramHashes],
      (exprs: Seq[Expression]) =>
        WordGramHashes(exprs(0), intArg(exprs(1)), boolArg(exprs(2)))),
    ("graft_heavyhits", classOf[MisraGries],
      (exprs: Seq[Expression]) => MisraGries(exprs(0), intArg(exprs(1)))),
    ("graft_topk", classOf[TopKByScore],
      (exprs: Seq[Expression]) => TopKByScore(exprs(0), exprs(1), intArg(exprs(2)))),
    ("graft_winnow", classOf[SlidingMinima],
      (exprs: Seq[Expression]) => SlidingMinima(exprs(0), intArg(exprs(1)))),
    ("graft_bloom_contains", classOf[BloomContains],
      (exprs: Seq[Expression]) =>
        BloomContains(exprs(0), scala.collection.immutable.ArraySeq.unsafeWrapArray(
          bytesArg(exprs(1))))))

  /** Register on an existing session. Idempotent without being
    * shadowable: a name is skipped only when the existing registration
    * is graft's own (checked via the ExpressionInfo class), so repeated
    * calls (one per operator) don't spam `SimpleFunctionRegistry`
    * replacement WARNs, while a pre-existing user temp function under a
    * graft name is still replaced — operators never silently compute
    * with a foreign implementation. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // lookup+register below is check-then-act; serialize concurrent
    // register() calls on the same session so both can't pass the
    // isOurs check and double-register (a WARN-only race, but the
    // contract here is WARN-free repeated registration)
    registry.synchronized {
      builders.foreach { case (name, cls, builder) =>
        val id = FunctionIdentifier(name)
        val isOurs = registry.lookupFunction(id).exists(_.getClassName == cls.getName)
        if (!isOurs) {
          registry.registerFunction(id, new ExpressionInfo(cls.getName, name), builder)
        }
      }
    }
  }
}

/** SparkSessionExtensions entry point:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    VectorFunctions.builders.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    // lambda dot products silently upgrade to the codegen expression
    e.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
