package graft

/** Physical-plan shape assertions: at 100 TB the difference between the right
  * and wrong plan is the whole game, so the shapes are pinned by test —
  * broadcast dims (no fact-side shuffle), top-k as TakeOrderedAndProject
  * (per-partition heaps, no global sort), partial+final aggregate split,
  * column-pruned scans with pushed filters, and a sweep proving no query in
  * the inventory ever degenerates into an unbounded cartesian product.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("top-k plans as TakeOrderedAndProject") {
    assert(plan("sort_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("star join broadcasts dimensions — no shuffle of the dim side") {
    val p = plan("join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("aggregation splits partial/final (map-side combine before the shuffle)") {
    val p = plan("agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("projection prunes the parquet scan to the selected columns") {
    val p = plan("scan_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id") && !readSchema.contains("props"),
      s"scan not pruned: $readSchema")
  }

  test("static bounds push down to the parquet scan") {
    val p = plan("extract_incr_bounds")
    assert(p.contains("GreaterThanOrEqual(event_id,200") && p.contains("LessThan(event_id,700"),
      s"bounds not pushed:\n$p")
  }

  test("no query in the inventory plans an unbounded cartesian product") {
    // join_cross is the deliberate cartesian demo; everything else must ride
    // an equi key (broadcast-nested-loop over a broadcast *small* side — e.g.
    // the 1-row scalar subquery in q22 or langid's 5-row dim — is fine and
    // distinct from CartesianProduct).
    for ((name, fn) <- SparkEntry.queries if name != "join_cross") {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }
}
