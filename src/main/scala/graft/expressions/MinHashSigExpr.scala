package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature over a token-hash array — ONE loop producing all
  * K permutation minima, replacing a K-pass HOF tree (K×`transform` +
  * `array_min`, each allocating an intermediate array per row) plus the
  * 3-pass `zip_with` trigram chain ahead of it.
  *
  * Bit-compatible by construction with the Column formulation it replaces
  * (`MinHashSigSpec` pins equality): for token hashes h₀..hₙ₋₁,
  * trigram gᵢ = X(hᵢ₊₂, X(X(hᵢ₊₁, X(hᵢ, 42)), 42)) — exactly
  * `xxhash64(xxhash64(hᵢ, hᵢ₊₁), hᵢ₊₂)` — and signature element p =
  * min over i of X(gᵢ, XXH64.hashInt(p, 42)) — exactly
  * `array_min(transform(g, x → xxhash64(lit(p), x)))` (the INT literal
  * folds through hashInt) — where X = `XXH64.hashLong(value, seed)`,
  * the same primitives Spark's `xxhash64` folds children with.
  *
  * Null input or fewer than 3 tokens → null (callers filter length ≥ 3,
  * matching the HOF pipeline's prefilter).
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 1024)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // fail at ANALYSIS time on wrong types, not mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint> token hashes, got ${t.simpleString}")
    }

  // permutation seeds = XXH64.hashInt(p, 42): `xxhash64(lit(p), x)` folds
  // the INT literal with hashInt, not hashLong — precomputed once
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(p => XXH64.hashInt(p, 42L))

  // null-element scan is emitted only when the input type admits nulls —
  // the hot path (containsNull = false, what the shingle pipeline produces)
  // pays nothing
  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    if (n < 3) return null
    if (mayHaveNullElements) {
      // null slots poison the whole signature (→ null), matching the HOF
      // pipeline where xxhash64 over a null token nulls the array element
      // and array_min propagates it
      var j = 0
      while (j < n) {
        if (h.isNullAt(j)) return null
        j += 1
      }
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      val ab = XXH64.hashLong(h.getLong(i + 1), XXH64.hashLong(h.getLong(i), 42L))
      val g = XXH64.hashLong(h.getLong(i + 2), XXH64.hashLong(ab, 42L))
      var p = 0
      while (p < k) {
        val v = XXH64.hashLong(g, seeds(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val ab = ctx.freshName("ab")
      val g = ctx.freshName("g")
      val v = ctx.freshName("v")
      val nullScan = if (mayHaveNullElements) {
        val j = ctx.freshName("j")
        s"""
           |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j)) ${ev.isNull} = true;
           |}
           |""".stripMargin
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n < 3) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    long[] $mins = new long[$k];
         |    java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |    for (int $i = 0; $i <= $n - 3; $i++) {
         |      long $ab = $xxh.hashLong($a.getLong($i + 1), $xxh.hashLong($a.getLong($i), 42L));
         |      long $g = $xxh.hashLong($a.getLong($i + 2), $xxh.hashLong($ab, 42L));
         |      for (int $p = 0; $p < $k; $p++) {
         |        long $v = $xxh.hashLong($g, $seedsRef[$p]);
         |        if ($v < $mins[$p]) $mins[$p] = $v;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column API: K-element MinHash signature of an `array<long>` of token
    * hashes (trigram shingling fused inside). */
  def minhashSig(tokenHashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(tokenHashes), k))
}
