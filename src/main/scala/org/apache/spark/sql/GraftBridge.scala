package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers so graft code can lift custom
  * Catalyst [[Expression]]s into user-facing [[Column]]s (the Spark 4.x
  * Column API is node-based; `classic.ExpressionUtils` does the lifting). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Sound per-column integral interval constraints implied by a
    * predicate Column's CONJUNCTS — the extraction behind graft's
    * manifest-level data skipping (GraftMerge.pruneByStats). Any
    * conjunct the walk does not recognize contributes no constraint (a
    * row matching `A AND B` matches A, so excluding a file by A's
    * bounds alone stays sound; an OR at the top yields no constraints).
    * Range bounds are LOOSE (`>` treated as `>=`) — no ±1 overflow
    * edge, still sound.
    *
    * Lives here because a Column predicate arrives in one of two
    * representations: the node-space tree the `col()/lit()` API builds
    * (`internal.UnresolvedFunction("=", …)`) or a Catalyst expression
    * wrapped by `ExpressionColumnNode` (the SQL DML path rebuilding
    * resolved statement predicates) — both walked below. */
  def conjunctBounds(c: Column): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.{internal => n}
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => CUA}

    def litLong(v: Any): Option[Long] = v match {
      case b: Byte => Some(b.toLong)
      case s: Short => Some(s.toLong)
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case _ => None
    }

    // --- catalyst-space walk (resolved SQL DML predicates) ---
    def cname(e: ce.Expression): Option[String] = e match {
      case a: ce.AttributeReference => Some(a.name)
      case u: CUA => Some(u.nameParts.last)
      case cst: ce.Cast => cname(cst.child)
      case _ => None
    }
    def clit(e: ce.Expression): Option[Long] = e match {
      case ce.Literal(v, _) => litLong(v)
      case cst: ce.Cast => clit(cst.child)
      case _ => None
    }
    def crange(a: ce.Expression, b: ce.Expression,
        lo: Long => Long, hi: Long => Long): Seq[(String, Long, Long)] =
      (for { nm <- cname(a); v <- clit(b) } yield (nm, lo(v), hi(v))).toSeq
    def cwalk(e: ce.Expression): Seq[(String, Long, Long)] = e match {
      case ce.And(l, r) => cwalk(l) ++ cwalk(r)
      case ce.EqualTo(a, b) =>
        crange(a, b, v => v, v => v) ++ crange(b, a, v => v, v => v)
      case ce.GreaterThan(a, b) =>
        crange(a, b, v => v, _ => Long.MaxValue) ++
          crange(b, a, _ => Long.MinValue, v => v)
      case ce.GreaterThanOrEqual(a, b) =>
        crange(a, b, v => v, _ => Long.MaxValue) ++
          crange(b, a, _ => Long.MinValue, v => v)
      case ce.LessThan(a, b) =>
        crange(a, b, _ => Long.MinValue, v => v) ++
          crange(b, a, v => v, _ => Long.MaxValue)
      case ce.LessThanOrEqual(a, b) =>
        crange(a, b, _ => Long.MinValue, v => v) ++
          crange(b, a, v => v, _ => Long.MaxValue)
      case ce.In(a, list) =>
        val vs = list.map(clit)
        if (vs.nonEmpty && vs.forall(_.isDefined))
          cname(a).map(nm => (nm, vs.flatten.min, vs.flatten.max)).toSeq
        else Seq.empty
      case _ => Seq.empty
    }

    // --- node-space walk (col()/lit()-built predicates) ---
    def nname(node: n.ColumnNode): Option[String] = node match {
      case a: n.UnresolvedAttribute => Some(a.nameParts.last)
      case cst: n.Cast => nname(cst.child)
      case _ => None
    }
    def nlit(node: n.ColumnNode): Option[Long] = node match {
      case l: n.Literal => litLong(l.value)
      case cst: n.Cast => nlit(cst.child)
      case _ => None
    }
    def nrange(a: n.ColumnNode, b: n.ColumnNode,
        lo: Long => Long, hi: Long => Long): Seq[(String, Long, Long)] =
      (for { nm <- nname(a); v <- nlit(b) } yield (nm, lo(v), hi(v))).toSeq
    def nwalk(node: n.ColumnNode): Seq[(String, Long, Long)] = node match {
      case e: classic.ExpressionColumnNode => cwalk(e.expression)
      case f: n.UnresolvedFunction =>
        val a = f.arguments
        f.functionName match {
          case "and" => a.flatMap(nwalk)
          case "=" | "==" if a.length == 2 =>
            nrange(a(0), a(1), v => v, v => v) ++
              nrange(a(1), a(0), v => v, v => v)
          case ">" if a.length == 2 =>
            nrange(a(0), a(1), v => v, _ => Long.MaxValue) ++
              nrange(a(1), a(0), _ => Long.MinValue, v => v)
          case ">=" if a.length == 2 =>
            nrange(a(0), a(1), v => v, _ => Long.MaxValue) ++
              nrange(a(1), a(0), _ => Long.MinValue, v => v)
          case "<" if a.length == 2 =>
            nrange(a(0), a(1), _ => Long.MinValue, v => v) ++
              nrange(a(1), a(0), v => v, _ => Long.MaxValue)
          case "<=" if a.length == 2 =>
            nrange(a(0), a(1), _ => Long.MinValue, v => v) ++
              nrange(a(1), a(0), v => v, _ => Long.MaxValue)
          case "in" if a.length >= 2 =>
            val vs = a.drop(1).map(nlit)
            if (vs.forall(_.isDefined))
              nname(a.head).map(nm => (nm, vs.flatten.min, vs.flatten.max)).toSeq
            else Seq.empty
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }

    nwalk(c.node)
      .groupBy(_._1)
      .map { case (col, bs) => col -> (bs.map(_._2).max, bs.map(_._3).min) }
  }
}
