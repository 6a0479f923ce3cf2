package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Longest-prefix path localization (SURVEY R9, "resolve_dest").
  *
  * Reference: design-doc pseudocode iceberg-arch-geo-distributed-ha.md:
  * 411-451 — rewrite a source URI to the local region's URI by the
  * longest matching source prefix, with an `ensure_local_prefix` guard
  * (output must start with the local prefix; unmatched paths are left
  * for quarantine).
  *
  * Spark-first: the mapping table is tiny configuration (dozens of
  * prefixes), so instead of a UDF we unroll it into a CASE chain ordered
  * longest-prefix-first. That keeps the rewrite inside whole-stage
  * codegen — at 100 TB manifest scale (1e8+ paths) a Scala UDF would pay
  * serialization per row; a codegen'd `when` chain with
  * `startswith`/`substring`/`concat` does not.
  */
object PathLocalizer {

  /** Build the localization column for `path`.
    * @param mappings (sourcePrefix -> localPrefix); longest source prefix
    *                 wins, ties impossible for distinct prefixes.
    * @return localized path, or null when no prefix matches (caller
    *         quarantines nulls — the doc's unmatched-path guard). */
  def localize(path: Column, mappings: Seq[(String, String)]): Column = {
    require(mappings.nonEmpty,
      "localize needs at least one prefix mapping (a region with none " +
      "configured should quarantine explicitly, not crash on .head)")
    // when-chain ordered longest-prefix-first: the first matching branch
    // wins, so longer prefixes shadow their own prefixes correctly.
    val ordered = mappings.sortBy { case (src, _) => -src.length }
    ordered.tail.foldLeft(
      when(path.startsWith(ordered.head._1),
           concat(lit(ordered.head._2), expr_substr(path, ordered.head._1)))) {
      case (chain, (src, dst)) =>
        chain.when(path.startsWith(src), concat(lit(dst), expr_substr(path, src)))
    }.otherwise(lit(null).cast("string"))
  }

  /** substring(path, len(prefix)+1) — the suffix after the prefix. */
  private def expr_substr(path: Column, prefix: String): Column =
    path.substr(lit(prefix.length + 1), length(path))
}
