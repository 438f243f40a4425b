package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text-signature loops.
  *
  * The array-HOF formulations (`transform`/`aggregate` lambdas) are
  * CORRECT but interpreted per element — measured ~10s for the d3
  * signature build at sf0.1. These expressions do the same math in
  * compiled JVM loops (one `eval` call per row), which is the
  * preference order SURVEY §4 prescribes: built-ins first, then a
  * custom Expression when the built-in shape can't be fast.
  *
  * Codegen: a `CodegenFallback` expression anywhere in a projection
  * pushes the WHOLE stage out of whole-stage codegen
  * (CollapseCodegenStages.supportCodegen rejects the plan), so the
  * signature expressions implement `doGenCode`. The heavy loops are
  * already compiled Scala — the generated code simply invokes them
  * through a plan reference object (`ctx.addReferenceObj`), which
  * keeps the surrounding stage fused without duplicating the loop
  * bodies as Java strings.
  *
  * Outputs are bit-identical to the HOF/oracle definitions (same
  * shingle set in first-occurrence order, same md5-derived h1/h2,
  * same affine permutation family) — the DuckDB oracle SQL is
  * unchanged.
  */

/** Distinct word-k-gram shingles of a token array, first-occurrence
  * order (= array_distinct(transform(...)) semantics).
  */
case class ShingleArray(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleArray", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** MinHash signature over a shingle array: per shingle ONE md5; h1/h2
  * = digest bytes 0-3 / 4-7 as unsigned 32-bit ints (≡ first/second 8
  * hex chars via conv(hex,16,10)); perm p value = (h1 + p·h2) mod
  * 4294967291; signature = per-perm minimum.
  */
case class MinHashSig(child: Expression, nPerms: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(nPerms)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var p = 0
      while (p < nPerms) {
        val v = (h1 + p * h2) % prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** tf-weighted 64-bit SimHash (Charikar) over a token array, as a
  * '0'/'1' string: per distinct token, bit b of md5(token) (hex-nibble
  * bit order, ≡ the hexVal/floor-power HOF form) contributes ±tf to
  * bit-sum b; sign (≥ 0 → '1') is the signature bit.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_sig"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashSig", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Int]()
    var i = 0
    while (i < n) {
      val tk = arr.getUTF8String(i)
      counts.put(tk, counts.getOrDefault(tk, 0) + 1)
      i += 1
    }
    val sums = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    counts.forEach { (tk, tf) =>
      md.reset()
      val d = md.digest(tk.getBytes)
      var b = 0
      while (b < 64) {
        val bit = (d(b >> 3) >> (7 - (b & 7))) & 1
        sums(b) += (2L * bit - 1) * tf
        b += 1
      }
    }
    val chars = new Array[Char](64)
    var b = 0
    while (b < 64) {
      chars(b) = if (sums(b) >= 0) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(chars))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Cosine similarity of two array<double> columns in one compiled
  * loop. Accumulation order is sequential (index 0..n-1), identical
  * to the zip_with/aggregate fold and to the oracle's
  * list_dot_product, so results are bit-equal.
  *
  * Implements TRUE `doGenCode` (not CodegenFallback): this expression
  * sits in the candidate-VERIFY filters/projections of d5/s4/s1–s3 —
  * the largest row sets the ANN family touches — and a fallback there
  * would force the whole enclosing stage out of whole-stage codegen
  * (row-at-a-time InternalRow plumbing around an otherwise codegen'd
  * join). The generated loop is the same arithmetic in the same
  * order, so results are unchanged; ExprSpec pins bit-equality
  * against the HOF form on the codegen path.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Flat row-major hyperplane matrix constant with a compact toString
  * (a quarter-million doubles must not be printed into plan strings /
  * explain output). Array-backed; equality is by (seed-derived)
  * length + identity, which is correct here because the matrix is a
  * process-wide constant per (nPlanes, dim).
  */
class PlaneMatrix(val values: Array[Double], val dim: Int) extends Serializable {
  override def toString: String = s"PlaneMatrix(${values.length / dim}x$dim)"
  override def hashCode(): Int = values.length * 31 + dim
  override def equals(o: Any): Boolean = o match {
    case p: PlaneMatrix => (p.values eq values) && p.dim == dim
    case _ => false
  }
}

/** Signed-random-projection signature (Charikar hyperplane LSH): bit h
  * = sign of <v, plane_h> over a constant plane matrix, emitted as a
  * '0'/'1' string of length nPlanes. One compiled loop per row — the
  * HOF formulation (transform over planes × aggregate over dims) is
  * interpreted per element and measured orders of magnitude slower at
  * thousands of planes. Dot accumulation is sequential over dims,
  * matching the oracle's list_dot_product.
  */
case class HyperplaneBits(child: Expression, planes: PlaneMatrix, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_bits"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBits", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), planes.dim)
    val out = new Array[Char](nPlanes)
    val w = planes.values
    var h = 0
    while (h < nPlanes) {
      var dot = 0.0
      val base = h * planes.dim
      var i = 0
      while (i < d) { dot += v.getDouble(i) * w(base + i); i += 1 }
      out(h) = if (dot >= 0) '1' else '0'
      h += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

/** Per-dimension threshold sign bits (the BQ signature): bit i = '1'
  * iff v(i) > thresholds(i), emitted as a '0'/'1' string of length
  * dim — one compiled loop per row. The HOF formulation (transform +
  * element_at on a 64-literal + array_join) evaluates interpreted
  * inside the serving scan; this keeps s17/s20's hot projection in a
  * tight loop (same win as [[HyperplaneBits]] over its HOF twin).
  * Output identical to the HOF form, including strict `>`.
  */
case class ThresholdBits(child: Expression, thresholds: PlaneMatrix)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "threshold_bits"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thresholdBits", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val t = thresholds.values
    val n = t.length
    val d = math.min(v.numElements(), n)
    val out = new Array[Char](n)
    var i = 0
    while (i < d) {
      out(i) = if (v.getDouble(i) > t(i)) '1' else '0'
      i += 1
    }
    while (i < n) { out(i) = '0'; i += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): ThresholdBits =
    copy(child = newChild)
}

/** Sketch AND banded bucket keys in ONE pass: struct(sketch BINARY
  * of the first sketchBits sign bits, keys ARRAY<LONG> of packed
  * band keys over all nBands·bandBits planes). One expression for
  * both serves two purposes: the plane dots are computed once (the
  * sketch's planes are a prefix of the band planes), and — critically
  * — a SINGLE multiply-referenced alias survives below a Generate,
  * where separate sketch/keys expressions got hoisted by the
  * optimizer into the post-explode projection and re-evaluated per
  * exploded row (measured 256× recompute in st5).
  */
case class HyperplaneSketchKeys(child: Expression, planes: PlaneMatrix,
    sketchBits: Int, nBands: Int, bandBits: Int)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSketchKeys", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sketch",
      org.apache.spark.sql.types.BinaryType, nullable = false),
    org.apache.spark.sql.types.StructField("keys",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "hyperplane_sketch_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), planes.dim)
    val w = planes.values
    val nPlanes = nBands * bandBits
    val bits = new Array[Boolean](nPlanes)
    var h = 0
    while (h < nPlanes) {
      var dot = 0.0
      val base = h * planes.dim
      var i = 0
      while (i < d) { dot += v.getDouble(i) * w(base + i); i += 1 }
      bits(h) = dot >= 0
      h += 1
    }
    val bytes = new Array[Byte]((sketchBits + 7) / 8)
    h = 0
    while (h < sketchBits) {
      if (bits(h)) bytes(h >> 3) = (bytes(h >> 3) | (1 << (7 - (h & 7)))).toByte
      h += 1
    }
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var j = 0
      while (j < bandBits) {
        key = (key << 1) | (if (bits(b * bandBits + j)) 1L else 0L)
        j += 1
      }
      keys(b) = (b.toLong << bandBits) | key
      b += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bytes, new GenericArrayData(keys))
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketchKeys =
    copy(child = newChild)
}

/** Banded LSH bucket keys as ONE long per band: key = (band << bandBits)
  * | bits-of-band (bit j of a band = sign of the (band·bandBits+j)-th
  * plane dot, big-endian — the same partition of planes as the string
  * form, so the candidate sets are identical while the join keys are
  * 8-byte longs instead of bandBits-char strings; at millions of
  * probe rows the shuffle is ~5× lighter).
  */
case class HyperplaneBandKeys(child: Expression, planes: PlaneMatrix,
    nBands: Int, bandBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_keys"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBandKeys", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), planes.dim)
    val w = planes.values
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var j = 0
      while (j < bandBits) {
        val base = (b * bandBits + j) * planes.dim
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v.getDouble(i) * w(base + i); i += 1 }
        key = (key << 1) | (if (dot >= 0) 1L else 0L)
        j += 1
      }
      keys(b) = (b.toLong << bandBits) | key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)
}

/** Multi-probe key set for a packed band key: the key itself plus
  * every Hamming-distance-1 variant of its low `bits` bits (Lv et
  * al., "Multi-Probe LSH", VLDB 2007) — probing neighbor buckets
  * recovers most of the recall extra hash tables would buy, at 1/L
  * of the signature cost. XOR never touches the band prefix, so
  * probes stay in-band.
  */
case class BitFlipProbes(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bit_flip_probes"

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    val out = new Array[Long](bits + 1)
    out(0) = key
    var j = 0
    while (j < bits) { out(j + 1) = key ^ (1L << j); j += 1 }
    new GenericArrayData(out)
  }

  // true codegen: this feeds the multi-probe EXPLODE — the widest
  // projection in the d5/s4 candidate path (one row per (vector,
  // band) before fan-out) — so it must not break the stage's codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val arr = ctx.freshName("arr"); val j = ctx.freshName("j")
      s"""
         |long[] $arr = new long[${bits + 1}];
         |$arr[0] = $key;
         |for (int $j = 0; $j < $bits; $j++) { $arr[$j + 1] = $key ^ (1L << $j); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BitFlipProbes =
    copy(child = newChild)
}

/** Centroid ids of a constant codebook ordered by descending cosine
  * similarity to the input vector (ties broken by ascending id) — one
  * compiled loop per row. `element_at(ranks, 1)` is the IVF list
  * assignment; `slice(ranks, 1, nProbe)` is the probe's list set. The
  * codebook rides along as a PlaneMatrix constant, so assignment is a
  * pure projection: NO join, NO shuffle, NO exchange keyed by vec_id.
  */
case class CentroidRanks(child: Expression, cents: PlaneMatrix)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_ranks"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidRanks", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = cents.dim
    val k = cents.values.length / dim
    val d = math.min(v.numElements(), dim)
    val w = cents.values
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0; var nc = 0.0; var nv = 0.0
      var i = 0
      while (i < d) {
        val x = v.getDouble(i); val y = w(c * dim + i)
        dot += x * y; nv += x * x; nc += y * y
        i += 1
      }
      sims(c) = dot / (math.sqrt(nv) * math.sqrt(nc))
      c += 1
    }
    val order = Array.range(0, k).sortBy(c => (-sims(c), c))
    new GenericArrayData(order)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidRanks =
    copy(child = newChild)
}

/** The FIRST element of [[CentroidRanks]] — the IVF list assignment —
  * computed as a direct argmax instead of ranking all k centroids
  * (`element_at(centroid_ranks(v), 1)` built k boxed (sim, id) tuples
  * and a full sort PER ROW; assignment is the build/maintain hot path,
  * every corpus vector pays it at index time). Same math, same tie
  * rule (descending cosine, ties to the LOWER id — strict `>` keeps
  * the earlier centroid), same degenerate-input order (a NaN cosine
  * ranks last, exactly where the total-order sort put it; all-NaN
  * returns centroid 0). Spec-locked equal to element_at(ranks, 1).
  */
case class CentroidTop1(child: Expression, cents: PlaneMatrix)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_top1"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTop1", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Integer) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = cents.dim
    val k = cents.values.length / dim
    val d = math.min(v.numElements(), dim)
    val w = cents.values
    var bestC = 0
    var best = Double.NaN
    var c = 0
    while (c < k) {
      var dot = 0.0; var nc = 0.0; var nv = 0.0
      var i = 0
      while (i < d) {
        val x = v.getDouble(i); val y = w(c * dim + i)
        dot += x * y; nv += x * x; nc += y * y
        i += 1
      }
      val s = dot / (math.sqrt(nv) * math.sqrt(nc))
      // NaN never beats a real cosine (total-order sort ranked NaN
      // last); a real cosine always beats the NaN placeholder
      if (!s.isNaN && (best.isNaN || s > best)) { best = s; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTop1 =
    copy(child = newChild)
}

/** Hamming distance between two equal-length bit strings. True
  * codegen for the same reason as [[CosineSim]]: it is the d4/s2
  * candidate-verify filter, running once per candidate pair.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0; var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) { if ($xb[$i] != $yb[$i]) $d++; }
         |${ev.value} = $d;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}
