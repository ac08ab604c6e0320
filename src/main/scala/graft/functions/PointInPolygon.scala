package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Point-in-polygon behind the dialect's `pointInPolygon(tuple(x, y),
  * ring[, holes…])` — even-odd ray casting over an outer ring plus
  * optional hole rings.
  *
  * ClickHouse documents the SIGNATURE (first argument the point tuple,
  * second the outer ring as an array of vertex tuples, further arguments
  * hole rings — "the polygon can contain holes") but NOT its on-edge or
  * self-intersection rules, so this mapping STATES them (the sparkbar
  * precedent — state the contract where the docs pin none):
  *
  *   - BOUNDARY IS INSIDE: a point exactly on any edge or vertex of the
  *     outer ring, or of a hole ring, returns true (a hole's boundary
  *     belongs to the polygon). Edge membership is decided by an exact
  *     cross-product-zero + bounding-box test on the Float64 values.
  *   - INTERIOR: the even-odd (ray-casting) rule with the standard
  *     half-open crossing test `(y1 > py) != (y2 > py)` — a horizontal
  *     ray through a vertex counts each incident edge once at most, so
  *     vertex-grazing rays never double-count. A point strictly inside
  *     a hole is outside.
  *   - rings are IMPLICITLY CLOSED (an edge joins the last vertex back
  *     to the first; a duplicated closing vertex is harmless);
  *   - a ring with fewer than 3 vertices has no interior (only its
  *     degenerate boundary can match);
  *   - NULL point, NULL ring, or a NULL vertex → NULL — adjudicated
  *     BEFORE any containment verdict, so the result never depends on
  *     where the point happens to sit relative to the non-null rings.
  *
  * Self-intersecting rings follow the even-odd rule verbatim (the
  * winding interpretation is NOT used). CodegenFallback: a per-row
  * vertex loop over small constant rings — the surrounding projection
  * stays codegen'd, and polygon arguments are almost always literals,
  * so FOLDABLE ring children are extracted to coordinate arrays exactly
  * once per expression instance, not per row.
  */
case class PointInPolygon(point: Expression, rings: Seq[Expression])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = point +: rings
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override lazy val foldable: Boolean = children.forall(_.foldable)

  /** (xs, ys) of a ring value; null when the ring or any vertex is NULL. */
  private def extractRing(rv: Any): (Array[Double], Array[Double]) = {
    if (rv == null) return null
    val arr = rv.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val v = arr.getStruct(j, 2)
      if (v.isNullAt(0) || v.isNullAt(1)) return null
      xs(j) = v.getDouble(0)
      ys(j) = v.getDouble(1)
      j += 1
    }
    (xs, ys)
  }

  /** Once-per-instance extraction for FOLDABLE ring children (a null
    * entry means not-foldable-or-null — evaluated per row instead,
    * which for a foldable NULL literal still yields NULL cheaply).
    */
  @transient private lazy val foldedRings: Array[(Array[Double], Array[Double])] =
    rings.map(r => if (r.foldable) extractRing(r.eval(null)) else null).toArray

  override def eval(input: InternalRow): Any = {
    // ALL ring arguments are extracted (and their nulls adjudicated)
    // before any verdict — a boundary hit on the outer ring must not
    // preempt a NULL hole ring (review finding).
    val extracted = new Array[(Array[Double], Array[Double])](rings.size)
    var i = 0
    while (i < rings.size) {
      val cached = foldedRings(i)
      val ex = if (cached != null) cached else extractRing(rings(i).eval(input))
      if (ex == null) return null
      extracted(i) = ex
      i += 1
    }
    val p = point.eval(input)
    if (p == null) return null
    val pr = p.asInstanceOf[InternalRow]
    if (pr.isNullAt(0) || pr.isNullAt(1)) return null
    val px = pr.getDouble(0)
    val py = pr.getDouble(1)
    val (oxs, oys) = extracted(0)
    if (PointInPolygon.onRing(px, py, oxs, oys)) return true // boundary is inside
    if (!PointInPolygon.strictlyIn(px, py, oxs, oys)) return false
    i = 1
    while (i < extracted.length) {
      val (hxs, hys) = extracted(i)
      if (PointInPolygon.onRing(px, py, hxs, hys)) return true // a hole's boundary belongs
      if (PointInPolygon.strictlyIn(px, py, hxs, hys)) return false // strictly inside a hole
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInPolygon =
    copy(point = newChildren.head, rings = newChildren.tail)
}

object PointInPolygon {

  /** Exact on-boundary test: the point lies on some (implicitly closed)
    * edge — zero cross product and inside the edge's bounding box.
    */
  def onRing(px: Double, py: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    var j = n - 1
    var i = 0
    while (i < n) {
      val cross = (xs(i) - xs(j)) * (py - ys(j)) - (ys(i) - ys(j)) * (px - xs(j))
      if (cross == 0.0 &&
          px >= math.min(xs(j), xs(i)) && px <= math.max(xs(j), xs(i)) &&
          py >= math.min(ys(j), ys(i)) && py <= math.max(ys(j), ys(i)))
        return true
      j = i
      i += 1
    }
    false
  }

  /** Even-odd ray casting with the half-open `(y1 > py) != (y2 > py)`
    * crossing rule; boundary points are resolved by [[onRing]] first, so
    * this only adjudicates strict interior vs strict exterior.
    */
  def strictlyIn(px: Double, py: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    if (n < 3) return false
    var in = false
    var j = n - 1
    var i = 0
    while (i < n) {
      if ((ys(i) > py) != (ys(j) > py) &&
          px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i))
        in = !in
      j = i
      i += 1
    }
    in
  }
}
