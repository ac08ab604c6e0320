package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The URL-hierarchy kernel behind ClickHouse's `URLHierarchy` /
  * `URLPathHierarchy` — tree-view prefix reports over the path+query
  * region of a URL.
  *
  * Documented semantics (implemented exactly): the array contains the URL
  * truncated at the end by the separator symbols `/` and `?` within the
  * path and query string; CONSECUTIVE separators count as one, and each
  * cut lands AFTER the whole separator run; the full URL is the final
  * element when it does not end in a separator. The docs' example:
  * `URLHierarchy('https://example.com/browse/CONV-6788')` =
  * `['https://example.com/', 'https://example.com/browse/',
  * 'https://example.com/browse/CONV-6788']`. `URLPathHierarchy` is the
  * same with protocol and host stripped from every element and the root
  * `/` element excluded: `['/browse/', '/browse/CONV-6788']`.
  *
  * STATED contract for the corners the docs leave unpinned (the sparkbar
  * precedent — state the boundary where the docs pin none):
  *   - the scan starts at the first `/` or `?` AFTER the `://`+host
  *     region (so the protocol's `//` is never a truncation point); with
  *     no `://` in the input, it starts at the first separator from
  *     position 0 (a bare `/a/b` path yields its own hierarchy);
  *   - a URL with NO separator after the host has an EMPTY hierarchy
  *     (the host alone is not a truncation point);
  *   - `#` is NOT a separator (the docs name only `/`,`?`): a fragment
  *     rides inside the final element;
  *   - a `/?` pair is ONE run (the documented consecutive-separator
  *     rule), so `/a/?q=1` cuts at `/a/?`, never at `/a/` alone.
  */
case class UrlHierarchy(child: Expression, pathOnly: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(UrlHierarchy.hierarchy(
      input.asInstanceOf[UTF8String].toString, pathOnly)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.UrlHierarchy.hierarchy($c.toString(), $pathOnly))")

  override protected def withNewChildInternal(newChild: Expression): UrlHierarchy =
    copy(child = newChild)
}

object UrlHierarchy {

  private def isSep(c: Char): Boolean = c == '/' || c == '?'

  /** The prefix array — see the class scaladoc for the full contract. */
  def hierarchy(url: String, pathOnly: Boolean): Array[UTF8String] = {
    val n = url.length
    // '://' marks a scheme only when no path/query separator precedes it:
    // a RELATIVE url carrying an absolute url in a query parameter
    // ('/redirect?u=https://x.com/p') must scan from position 0 per the
    // scheme-less contract above, not skip to the embedded scheme.
    val protoCand = url.indexOf("://")
    val proto =
      if (protoCand >= 0 && url.substring(0, protoCand).exists(isSep)) -1
      else protoCand
    // The path region begins at the first separator after '://'+host
    // (the '//' of the protocol is skipped wholesale by starting the
    // separator scan past it).
    var i = if (proto >= 0) proto + 3 else 0
    while (i < n && !isSep(url.charAt(i))) i += 1
    val pathStart = i
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    while (i < n) {
      var j = i
      while (j < n && isSep(url.charAt(j))) j += 1 // the whole run is one cut
      val prefix =
        if (pathOnly) url.substring(pathStart, j) else url.substring(0, j)
      if (!(pathOnly && prefix == "/")) // the root element is excluded
        out += UTF8String.fromString(prefix)
      i = j
      while (i < n && !isSep(url.charAt(i))) i += 1
      if (i == n && i > j) // a non-separator tail: the full URL closes the array
        out += UTF8String.fromString(
          if (pathOnly) url.substring(pathStart) else url)
    }
    out.toArray
  }
}
