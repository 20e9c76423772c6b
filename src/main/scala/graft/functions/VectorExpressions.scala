package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for vector math (SURVEY.md §2.4 scale path).
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are evaluated
  * interpreted — they fall out of whole-stage codegen and allocate an
  * intermediate array per row. For the similarity operators that fold over
  * 64-dim embeddings for every candidate pair, that interpretation cost
  * dominated the benchmark (45s for 125k pairs at sf0.1). `DotProduct`
  * generates a tight primitive loop instead (~15× faster) while keeping the
  * exact left-to-right summation order of the interpreted fold — so results
  * stay bit-identical to the DuckDB oracle's list_reduce.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Inputs must be array<double> (callers cast; no implicit coercion here —
  // ExpectsInputTypes is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"graft_dot: length mismatch ($n vs ${y.numElements()}) — dimension drift must fail loudly")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException("graft_dot: length mismatch (" + $n +
         |    " vs " + $y.numElements() + ") - dimension drift must fail loudly");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of unsigned byte values of a binary column — the multimodal stub
  * featurizer's checksum as a codegen'd scalar (the higher-order
  * `aggregate(transform(split(...)))` form is interpreted and allocates a
  * per-char array per row). For ASCII payloads this equals the sum of
  * ascii() codes, which is what the DuckDB oracle computes. */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bytesum"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $x.length; $i++) {
         |  $s += $x[$i] & 0xff;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shannon entropy in BITS of a binary payload's 256-bin byte histogram —
  * the streaming payload gate's entropy rule as ONE codegen'd pass. The
  * prior higher-order form `array_sort`ed every payload's char array and
  * diffed run boundaries: O(len·log len) interpreted per row (~150 µs/row
  * at 200–480 B — the one per-ROW-cost arm in the stream bench; the sort
  * is only needed when the rule wants RUNS, and entropy does not). Exact
  * log2 form (ln n − Σ c·ln c / n)/ln 2 over the byte counts; 0.0 for an
  * empty payload. For ASCII payloads this equals the batch
  * `mm_payload_entropy` ascii()-histogram entropy — the shared-column
  * contract the streaming mirror spec pins. */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_entropy"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n == 0) 0.0
    else {
      val hist = new Array[Int](256)
      var i = 0
      while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
      var s = 0.0
      var k = 0
      while (k < 256) { val c = hist(k); if (c > 0) s += c * math.log(c); k += 1 }
      (math.log(n) - s / n) / math.log(2.0)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val hist = ctx.freshName("hist")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |int $n = $x.length;
         |${ev.value} = 0.0;
         |if ($n > 0) {
         |  int[] $hist = new int[256];
         |  for (int $i = 0; $i < $n; $i++) { $hist[$x[$i] & 0xff]++; }
         |  double $s = 0.0;
         |  for (int $k = 0; $k < 256; $k++) {
         |    int $c = $hist[$k];
         |    if ($c > 0) { $s += $c * java.lang.Math.log($c); }
         |  }
         |  ${ev.value} = (java.lang.Math.log($n) - $s / $n) / java.lang.Math.log(2.0);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Spec-faithful Iceberg `bucket[n]` of an integral value — canonical
  * murmur3_x86_32 over the widened long's little-endian bytes, then
  * (hash & Int.MaxValue) % n ([[Murmur3]]; spec §Partition Transforms +
  * §Appendix B). A codegen'd static call, not a UDF: the per-row work in
  * a bucketed write stays inside WholeStageCodegen. */
case class Murmur3Bucket(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_bucket_murmur3"

  override def nullSafeEval(v: Any, n: Any): Any =
    Murmur3.bucketLong(v.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.Murmur3.bucketLong($v, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `graft_dot` / `graft_bytesum` / `graft_entropy` /
    * `graft_bucket_murmur3` in the session so operators can use them via
    * expr(...). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", (children: Seq[Expression]) => DotProduct(children(0), children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bytesum", (children: Seq[Expression]) => ByteSum(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_entropy", (children: Seq[Expression]) => ByteEntropy(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucket_murmur3",
      (children: Seq[Expression]) => Murmur3Bucket(children(0), children(1)), "built-in")
  }
}
