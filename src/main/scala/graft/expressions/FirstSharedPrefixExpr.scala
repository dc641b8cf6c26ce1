package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native exactly-once check for the bucket-local PREFIX verification tier
  * ([[graft.operators.Dedup.prefixJaccardPairs]]): true iff `h` is the
  * FIRST element of `phA` (the rarity-ordered prefix-hash array of the
  * ELECTING side — the call site passes the lower-doc_id side's ph/hk;
  * any deterministic side works) that also occurs in `phB` — i.e. this
  * bucket IS the pair's canonical evaluation bucket and every other
  * shared bucket must skip the pair.
  *
  * Sharedness is defined BY HASH, exactly as bucket membership is: if two
  * distinct shingles collide in xxhash64, the pair still meets in that
  * collided bucket, the rule still elects exactly one bucket, and the
  * exact string verification downstream decides the pair — so collisions
  * can add candidate evaluations but never lose or duplicate a pair (the
  * same argument that makes [[EarlierBandCollisionExpr]]'s least-band rule
  * lossless: the discriminator and the bucket key use the SAME predicate).
  *
  * The check runs at Σ_bucket occ² join-fan cardinality (the r11 lesson:
  * interpreted-vs-codegen status is invisible at output cardinality and
  * decisive at fan cardinality), hence a native expression over two flat
  * long arrays — an `exists`/`array_position` HOF chain here would be a
  * CodegenFallback hash-build per joined row. Deliberately SYMMETRIC in
  * column usage (both sides contribute exactly their `ph` array and the
  * bucket key): a one-sided spelling (a-side position + b-side sorted
  * probes) would prune different columns from the two branches of the
  * bucket self-join and split the shared exchange's canonical subtree —
  * the q104 census lesson in self-join form.
  *
  * Cost per joined row is O(pos(h in phA) × |phB|) long compares with
  * prefix lengths ≈ (1−t)·n + 1 (≤ ~20 for gate-scale docs at t = 0.8) —
  * noise inside whole-stage codegen next to the sort-merge machinery.
  * Null inputs (never produced by the tier) yield null, which a join
  * condition treats as false.
  */
case class FirstSharedPrefixExpr(phA: Expression, phB: Expression,
    h: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(phA, phB, h)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "is_first_shared_prefix"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(phA.dataType) && arr(phB.dataType) && h.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>, bigint), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = phA.eval(input); val b = phB.eval(input); val hv = h.eval(input)
    if (a == null || b == null || hv == null) return null
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val target = hv.asInstanceOf[Long]
    val na = xa.numElements(); val nb = xb.numElements()
    var i = 0
    while (i < na) {
      val e = xa.getLong(i)
      var j = 0
      var found = false
      while (j < nb && !found) {
        if (xb.getLong(j) == e) found = true
        j += 1
      }
      if (found) return e == target
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ea = phA.genCode(ctx); val eb = phB.genCode(ctx); val eh = h.genCode(ctx)
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val e = ctx.freshName("e"); val found = ctx.freshName("found")
    val outer = ctx.freshName("outer")
    val anyNull = (Seq(ea, eb, eh) zip Seq(phA, phB, h))
      .collect { case (c, x) if x.nullable => c.isNull.toString }
    val nullCheck = if (anyNull.isEmpty) "false" else anyNull.mkString(" || ")
    val loop =
      s"""
         |if ($nullCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $na = ${ea.value}.numElements();
         |  int $nb = ${eb.value}.numElements();
         |  $outer: for (int $i = 0; $i < $na; $i++) {
         |    long $e = ${ea.value}.getLong($i);
         |    boolean $found = false;
         |    for (int $j = 0; $j < $nb && !$found; $j++) {
         |      if (${eb.value}.getLong($j) == $e) $found = true;
         |    }
         |    if ($found) { ${ev.value} = ($e == ${eh.value}); break $outer; }
         |  }
         |}
       """.stripMargin
    ev.copy(code =
      code"""
        ${ea.code}
        ${eb.code}
        ${eh.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = false;
        $loop""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(phA = newChildren(0), phB = newChildren(1), h = newChildren(2))
}

object FirstSharedPrefixExpr {
  /** Column API: is `h` the first element of `phA` (in phA's order) that
    * also occurs in `phB`? */
  def isFirstShared(phA: Column, phB: Column, h: Column): Column =
    ColumnBridge.column(FirstSharedPrefixExpr(
      ColumnBridge.expression(phA), ColumnBridge.expression(phB),
      ColumnBridge.expression(h)))
}
