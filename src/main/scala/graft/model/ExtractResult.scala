package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The unit of dataflow between extractor and loader (reference:
  * mkpipe_extractor_clickhouse/__init__.py:106,108,132-134). Tri-state:
  *   - (Some(df with rows), Append|Overwrite, Some(lastPoint)) — normal batch;
  *   - (Some(empty df), Overwrite, None) — empty initial/full load, so the
  *     loader still truncates the target (reference: __init__.py:104-106);
  *   - (None, Append, None) — "no new data", a no-op for the loader
  *     (reference: __init__.py:107-108).
  * `lastPoint` is deliberately stringly-typed end-to-end, matching the
  * reference's `str(max_val)` persistence contract (__init__.py:114).
  */
final case class ExtractResult(
    df: Option[DataFrame],
    writeMode: SaveMode,
    lastPoint: Option[String] = None,
)
