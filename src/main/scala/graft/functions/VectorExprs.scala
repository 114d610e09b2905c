package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * `vec_dot(a, b)`: double-precision sequential dot product over
 * `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` as a native Catalyst expression.
 *
 * The built-in formulation `aggregate(zip_with(a, b, *), 0d, +)`
 * evaluates interpreted (higher-order functions have no codegen) and
 * allocates an intermediate array per row; this expression is a tight
 * codegen'd loop — the difference is ~10× on the similarity-search hot
 * path. Accumulation order is left-to-right in double, bit-identical to
 * the sequential fold (and to the SQL oracle's list_sum).
 */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = isFloat(left); val yf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}

/**
 * `vec_dot_multi(vec)`: dot products of a vector against a FIXED set of
 * `m` reference vectors (centroids/hyperplanes) as one `ARRAY<DOUBLE>` —
 * a single tight codegen'd loop instead of `m` separate `VecDot`s
 * against literal arrays (whose combined generated-code size puts javac
 * on the critical path). Element order and per-dot accumulation order
 * are identical to the composed form, so downstream comparisons see
 * bit-identical values.
 */
case class VecDotMulti(child: Expression, refVectors: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_multi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_multi requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val refs: Array[Array[Double]] =
    refVectors.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Double](refs.length)
    var m = 0
    while (m < refs.length) {
      val r = refs(m)
      val n = math.min(r.length, v.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += r(i) * (if (fl) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
      out(m) = acc
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val refsRef = ctx.addReferenceObj("refs", refs, "double[][]")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      val r = ctx.freshName("r") // freshName EVERY local: inlined copies share scope
      val getElem = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double[] $out = new double[${refs.length}];
         |for (int $m = 0; $m < ${refs.length}; $m++) {
         |  double[] $r = $refsRef[$m];
         |  int $n = java.lang.Math.min($r.length, $v.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) $acc += $r[$i] * $getElem;
         |  $out[$m] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecDotMulti =
    copy(child = newChild)
}

object VecDotMulti {
  def apply(vec: Column, refVectors: Seq[Seq[Double]]): Column =
    Bridge.column(VecDotMulti(Bridge.expression(vec), refVectors))
}

/**
 * `argmax_dot(vec)`: id of the reference vector with the LARGEST dot
 * product against `vec`, ties broken toward the larger id — exactly the
 * semantics of `array_max` over `(sim, id)` structs, in ONE expression.
 *
 * Splitting score computation (`VecDotMulti` as a column) from the
 * argmax invites the optimizer to inline the multi-dot into every
 * per-id use (CollapseProject has no cost model for custom
 * expressions), multiplying both the arithmetic and the generated-code
 * size; fusing score + argmax leaves nothing to inline.
 *
 * r13: the SLICE and the distance BIAS are fused in as well.
 * `sliceFrom`/`sliceLen` dot against `vec[sliceFrom, sliceFrom+len)`
 * by INDEX — the callers that quantize subvectors (PQ subspaces, IMI
 * halves) previously built a `slice(...)` (and PQ a
 * `concat(slice, array(1.0))` bias-augmentation) per row per
 * subspace: 16+ short-lived array copies per encoded row on the index
 * build/append path, pure allocator traffic at 20M-vector builds.
 * `biases(m)` is added AFTER the dot accumulation (bias-last, exactly
 * where the old augmented-element landed) so results are bit-identical
 * to the concat form for full-length vectors.
 */
case class ArgMaxDot(child: Expression, refVectors: Seq[Seq[Double]], ids: Seq[Int],
                     sliceFrom: Int = 0, sliceLen: Int = -1,
                     biases: Seq[Double] = Nil)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(refVectors.length == ids.length, "one id per reference vector")
  require(sliceFrom >= 0, "sliceFrom is 0-based and non-negative")
  require(biases.isEmpty || biases.length == refVectors.length,
    "one bias per reference vector (or none)")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "argmax_dot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmax_dot requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val refs: Array[Array[Double]] = refVectors.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val biasArr: Array[Double] =
    if (biases.isEmpty) Array.empty else biases.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val avail = math.max(0, v.numElements() - sliceFrom)
    val lim = if (sliceLen < 0) avail else math.min(sliceLen, avail)
    var best = Double.NegativeInfinity
    var bestId = Int.MinValue
    var m = 0
    while (m < refs.length) {
      val r = refs(m)
      val n = math.min(r.length, lim)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val j = sliceFrom + i
        acc += r(i) * (if (fl) v.getFloat(j).toDouble else v.getDouble(j))
        i += 1
      }
      if (biasArr.length > 0) acc += biasArr(m)
      if (acc > best || (acc == best && idArr(m) > bestId)) { best = acc; bestId = idArr(m) }
      m += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val refsRef = ctx.addReferenceObj("refs", refs, "double[][]")
      val idsRef = ctx.addReferenceObj("ids", idArr, "int[]")
      val biasRef =
        if (biases.isEmpty) "" else ctx.addReferenceObj("biases", biasArr, "double[]")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      val r = ctx.freshName("r"); val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId"); val lim = ctx.freshName("lim")
      val j = ctx.freshName("j")
      val getElem = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      val limExpr =
        if (sliceLen < 0) s"java.lang.Math.max(0, $v.numElements() - $sliceFrom)"
        else s"java.lang.Math.min($sliceLen, java.lang.Math.max(0, $v.numElements() - $sliceFrom))"
      val addBias = if (biases.isEmpty) "" else s"$acc += $biasRef[$m];"
      s"""
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |int $bestId = java.lang.Integer.MIN_VALUE;
         |int $lim = $limExpr;
         |for (int $m = 0; $m < ${refs.length}; $m++) {
         |  double[] $r = $refsRef[$m];
         |  int $n = java.lang.Math.min($r.length, $lim);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { int $j = $sliceFrom + $i; $acc += $r[$i] * $getElem; }
         |  $addBias
         |  if ($acc > $best || ($acc == $best && $idsRef[$m] > $bestId)) {
         |    $best = $acc; $bestId = $idsRef[$m];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDot =
    copy(child = newChild)
}

object ArgMaxDot {
  def apply(vec: Column, refVectors: Seq[Seq[Double]], ids: Seq[Int]): Column =
    Bridge.column(ArgMaxDot(Bridge.expression(vec), refVectors, ids))
  /** Fused-slice (+ optional per-ref bias) form — see the class doc. */
  def sliced(vec: Column, refVectors: Seq[Seq[Double]], ids: Seq[Int],
             from: Int, len: Int, biases: Seq[Double] = Nil): Column =
    Bridge.column(ArgMaxDot(Bridge.expression(vec), refVectors, ids, from, len, biases))
}

/**
 * `sign_lsh_buckets(vec)`: ALL `nTables` random-hyperplane bucket ids of
 * a vector in one expression — element t is the nBits-bit signature of
 * table t (bit p set iff dot(vec, plane[t][p]) ≥ 0).
 *
 * The Column-composition form (nTables × nBits `VecDot`s against
 * 64-literal arrays) generates an enormous codegen tree whose javac
 * time dominates small queries; this expression is one tight triple
 * loop over a shared `double[][][]` reference. Plane components are the
 * same deterministic hash-derived values ([[planesFor]]), so bucket ids
 * are identical to the composed form.
 */
case class SignLshBuckets(child: Expression, nTables: Int, nBits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    SignLshBuckets.planesFor(nTables, nBits, dims)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(dims, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nBits) {
        val pl = planes(t)(p)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += pl(i) * (if (fl) v.getFloat(i).toDouble else v.getDouble(i))
          i += 1
        }
        if (acc >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket"); val n = ctx.freshName("n")
      val pl = ctx.freshName("pl") // freshName EVERY local: inlined copies share scope
      val getElem = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($dims, $v.numElements());
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $nBits; $p++) {
         |    double[] $pl = $planesRef[$t][$p];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) $acc += $pl[$i] * $getElem;
         |    if ($acc >= 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {
  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim) in [-1, 1) — no RNG state, stable across runs and engines.
    * productHash is kept (deprecated in 2.13.17) because switching to
    * caseClassHash would silently change every plane, bucket id, and
    * ANN result between builds. */
  @scala.annotation.nowarn("cat=deprecation")
  def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((table, plane, dim))
    h.toDouble / Int.MaxValue.toDouble
  }

  def planesFor(nTables: Int, nBits: Int, dims: Int): Array[Array[Array[Double]]] =
    Array.tabulate(nTables, nBits, dims)(planeComponent)

  def apply(vec: Column, nTables: Int, nBits: Int, dims: Int): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(vec), nTables, nBits, dims))
}

/**
 * `pq_adc_dist(codes|packed, query_id)`: the FULL asymmetric (ADC)
 * distance `Σ_s lut[query][s·kSub + code_s]` in ONE projection.
 *
 * The composed form this replaces — `posexplode(codes)` (or
 * `pqUnpack(packed)`) → broadcast LUT join on (query, sub, code) →
 * `groupBy(query, neighbor).sum(pd)` — multiplied every candidate row
 * by m=16 intermediate rows and paid a full hash-aggregate EXCHANGE of
 * them per serve. The per-query LUTs are aggregate-sized by
 * construction (|queries|·m·kSub doubles — the same data the old plan
 * broadcast as a join side), so they ride along as a codegen reference
 * object and the whole ADC stage collapses into the candidate
 * projection: no row multiplication, no shuffle, and the subspace sum
 * runs in FIXED s-order (the old aggregate summed in shuffle-arrival
 * order, which was nondeterministic at ULP level).
 *
 * Left input: `ARRAY<INT>` codes (in-memory paths) or packed `LONG`
 * (layout paths, 4-bit nibbles, MSB-first — [[graft.ops.Similarity.pqPack]]'s
 * format). An unknown query id throws: candidates only exist via a
 * probe join against these very query ids, so a miss is a broken plan,
 * not data.
 */
case class PqAdcDist(left: Expression, right: Expression,
                     queryIds: Seq[Long], luts: Seq[Seq[Double]], m: Int)
    extends BinaryExpression {
  require(queryIds.length == luts.length && luts.nonEmpty,
    "one LUT row per query id")
  require(luts.head.length % m == 0, "LUT row length must be m*kSub")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dist"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // The packed-LONG decode below hardcodes 4-bit nibbles, which is
    // only correct for kSub == 16; a wider codebook over a packed
    // layout must fail at plan time, not with silently wrong distances.
    case (LongType, LongType) if luts.head.length / m != 16 =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dist packed-LONG input requires kSub == 16 (4-bit nibbles), got kSub = ${luts.head.length / m}")
    case (ArrayType(IntegerType, _), LongType) | (LongType, LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist requires (ARRAY<INT> | LONG, LONG), got $other")
  }

  private def isPacked: Boolean = left.dataType == LongType

  // ids sorted for binary search; LUT rows permuted to match
  @transient private lazy val sortedIds: Array[Long] = {
    val perm = queryIds.indices.sortBy(queryIds).toArray
    perm.map(queryIds)
  }
  @transient private lazy val lutArr: Array[Array[Double]] = {
    val perm = queryIds.indices.sortBy(queryIds).toArray
    perm.map(i => luts(i).toArray)
  }
  @transient private lazy val kSub: Int = luts.head.length / m

  private def lookup(qid: Long): Array[Double] = {
    val i = java.util.Arrays.binarySearch(sortedIds, qid)
    if (i < 0) throw new IllegalStateException(
      s"pq_adc_dist: query id $qid has no LUT — candidates must come from the probe join")
    lutArr(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = lookup(r.asInstanceOf[Long])
    var acc = 0.0
    var s = 0
    if (isPacked) {
      val p = l.asInstanceOf[Long]
      while (s < m) {
        val code = ((p >>> ((m - 1 - s) * 4)) & 0xFL).toInt
        acc += lut(s * kSub + code)
        s += 1
      }
    } else {
      val arr = l.asInstanceOf[ArrayData]
      while (s < m) { acc += lut(s * kSub + arr.getInt(s)); s += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val idsRef = ctx.addReferenceObj("sortedIds", sortedIds, "long[]")
      val lutsRef = ctx.addReferenceObj("luts", lutArr, "double[][]")
      val qi = ctx.freshName("qi"); val lut = ctx.freshName("lut")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val codeExpr =
        if (isPacked) s"(int) (($l >>> ((${m - 1} - $s) * 4)) & 0xFL)"
        else s"$l.getInt($s)"
      s"""
         |int $qi = java.util.Arrays.binarySearch($idsRef, $r);
         |if ($qi < 0) throw new IllegalStateException(
         |  "pq_adc_dist: query id " + $r + " has no LUT — candidates must come from the probe join");
         |double[] $lut = $lutsRef[$qi];
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $code = $codeExpr;
         |  $acc += $lut[$s * $kSub + $code];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}

object PqAdcDist {
  def apply(codesOrPacked: Column, queryId: Column,
            queryIds: Seq[Long], luts: Seq[Seq[Double]], m: Int): Column =
    Bridge.column(PqAdcDist(Bridge.expression(codesOrPacked),
      Bridge.expression(queryId), queryIds, luts, m))
}
