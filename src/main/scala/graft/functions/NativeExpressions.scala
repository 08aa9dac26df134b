package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §7.3: cosine is "the only place a
  * custom expression is even plausibly warranted"; single-pass SimHash
  * joined it after profiling showed 32 interpreted aggregate passes).
  *
  * Both implement `doGenCode`, so they stay inside whole-stage codegen —
  * the generated loop runs over the array's unsafe memory with zero
  * per-element boxing, vs the higher-order-function path which evaluates
  * an interpreted lambda per element. Semantics are bit-identical to the
  * HOF formulations (same accumulation order, same xxhash64 seed), which
  * the test suite asserts.
  */
object NativeExpressions {

  /** cosine(a, b) over float arrays, double accumulation, sequential
    * order; 0.0 for zero-norm inputs (matches Similarity.cosine).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float> inputs, got ${left.dataType}, ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val denom = ctx.freshName("denom")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.getFloat($i);
           |  double $yv = (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |double $denom = Math.sqrt($na) * Math.sqrt($nb);
           |${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** Single-pass 32-bit SimHash over a token array: per-token xxhash64
    * (seed 42, identical to the `xxhash64` builtin), per-bit majority
    * votes, one traversal (the HOF formulation needs one pass per bit).
    */
  case class SimHash64(child: Expression, bits: Int = 32)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash expects array<string>, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      SimHashUtil.simhash(input.asInstanceOf[ArrayData], bits)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val util = SimHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $util.simhash($a, $bits);")
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Interpreted core shared by eval and generated code (the per-token
    * hash is the hot loop either way; codegen removes the per-bit passes
    * and lambda dispatch).
    */
  object SimHashUtil {
    def simhash(arr: ArrayData, bits: Int): Long = {
      val votes = new Array[Int](bits)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        val h = XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        i += 1
      }
      var out = 0L; var b = 0
      while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Word-n-gram shingle hashes in one pass: for each window of `n`
    * tokens, hash the space-joined shingle exactly as
    * `xxhash64(concat_ws(" ", slice(toks, i, n)))` would (UTF8String
    * concatWs + XXH64 seed 42 — asserted bit-equal to the HOF path in
    * tests), deduped keeping first occurrence (array_distinct semantics).
    * Avoids materializing shingle strings as a column: the downstream
    * minhash/Jaccard pipeline runs on longs.
    */
  case class ShingleHashes(child: Expression, n: Int = 3)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"shingle_hashes expects array<string>, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.shingleHashes(input.asInstanceOf[ArrayData], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val util = ShingleUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $util.shingleHashes($a, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  object ShingleUtil {
    private val sep = UTF8String.fromString(" ")
    def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
      val num = toks.numElements()
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      if (num < n) {
        // short doc: one shingle of all tokens (matches the HOF guard)
        val parts = new Array[UTF8String](num)
        var i = 0
        while (i < num) { parts(i) = toks.getUTF8String(i); i += 1 }
        val sh = UTF8String.concatWs(sep, parts: _*)
        seen.add(XxHash64Function.hash(sh, StringType, 42L))
      } else {
        var i = 0
        val parts = new Array[UTF8String](n)
        while (i <= num - n) {
          var j = 0
          while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          val sh = UTF8String.concatWs(sep, parts: _*)
          seen.add(XxHash64Function.hash(sh, StringType, 42L))
          i += 1
        }
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator(); var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Character n-gram hashes in one pass over the string: hash of every
    * n-char window (code-point based, matching `substr`'s semantics, so
    * bit-equal to `transform(grams, xxhash64)` over the HOF gram path —
    * asserted in tests), deduped keeping first occurrence. Short strings
    * (< n chars) yield the single whole-string gram.
    */
  case class CharGramHashes(child: Expression, n: Int = 4)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"char_gram_hashes expects string, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      CharGramUtil.gramHashes(input.asInstanceOf[UTF8String], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val util = CharGramUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $util.gramHashes($a, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
      copy(child = newChild)
  }

  object CharGramUtil {
    def gramHashes(s: UTF8String, n: Int): ArrayData = {
      val total = s.numChars()
      val count = math.max(total - n + 1, 1)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 1
      while (i <= count) {
        val gram = s.substringSQL(i, n)
        seen.add(XxHash64Function.hash(gram, StringType, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator(); var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Register the native functions on a session (idempotent). The library
    * deployment path is [[GraftExtensions]] via spark.sql.extensions; this
    * direct registration serves sessions the engine did not construct.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)),
      "built-in")
    reg.createOrReplaceTempFunction("simhash",
      (children: Seq[Expression]) => SimHash64(children.head),
      "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      (children: Seq[Expression]) => ShingleHashes(children.head),
      "built-in")
    reg.createOrReplaceTempFunction("char_gram_hashes",
      (children: Seq[Expression]) => CharGramHashes(children.head),
      "built-in")
  }

  /** Column-API entry points. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("cosine_sim", a, b)
  }
  def simhashNative(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("simhash", toks)
  }
  def shingleHashes(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("shingle_hashes", toks)
  }
  def charGramHashes(spark: SparkSession, text: Column): Column = {
    register(spark); call_function("char_gram_hashes", text)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * native functions into every session of a deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(NativeExpressions.CosineSimilarity.getClass.getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        NativeExpressions.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(NativeExpressions.SimHash64.getClass.getName, "simhash"),
      (children: Seq[Expression]) => NativeExpressions.SimHash64(children.head)))
  }
}
