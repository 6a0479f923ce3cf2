package graft.operators

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuation-token pagination (SURVEY C8/Y3; reference
  * modules/domain/.../Pagination.scala:4-26 — pageSize capped at 10000,
  * opaque resume token).
  *
  * Spark-first KEYSET pagination: offset/limit rescans and discards
  * `offset` rows on every page (O(n²) work across a full listing, and
  * unstable under concurrent inserts); the token encodes the last key
  * served, so each page is `key > token ORDER BY key LIMIT size` — which
  * plans as one distributed TakeOrderedAndProject per page, O(n) total,
  * and stays correct as long as keys are unique (enforce with a
  * tie-broken composite key upstream).
  */
object Pagination {

  val MaxPageSize = 10000

  /** Tokens are opaque to callers: base64url of the last served key. */
  def encodeToken(lastKey: String): String =
    Base64.getUrlEncoder.encodeToString(lastKey.getBytes(StandardCharsets.UTF_8))

  def decodeToken(token: String): String =
    new String(Base64.getUrlDecoder.decode(token), StandardCharsets.UTF_8)

  private def clamp(pageSize: Int): Int = {
    require(pageSize >= 1, s"pageSize must be >= 1, got $pageSize")
    math.min(pageSize, MaxPageSize)
  }

  /** One page: rows strictly after the token's key, in key order. The
    * token rides as a string but is compared in the key's NATIVE type —
    * a string-literal comparison over a numeric key would resume from
    * the lexicographic position and re-serve rows. */
  def page(df: DataFrame, keyCol: String, pageSize: Int,
           token: Option[String] = None): DataFrame = {
    val size = clamp(pageSize)
    val keyType = df.schema(keyCol).dataType
    token.map(t => df.filter(col(keyCol) > lit(decodeToken(t)).cast(keyType)))
      .getOrElse(df)
      .orderBy(col(keyCol))
      .limit(size)
  }

  /** Continuation token for the page that followed `token` — None when the
    * page was short (end of listing). Collects at most one page (≤ 10000
    * keys) to find the resume point. collect() preserves the page's
    * orderBy+limit order, so the LAST row collected is the last key
    * served — never a lexicographic max over stringified keys, which
    * disagrees with the native order for numeric keys (page [2,10] must
    * resume after 10, not "2") and for non-BMP strings. */
  def nextToken(df: DataFrame, keyCol: String, pageSize: Int,
                token: Option[String] = None): Option[String] = {
    val size = clamp(pageSize)
    val keys = page(df, keyCol, pageSize, token)
      .select(col(keyCol).cast("string")).collect().map(_.getString(0))
    if (keys.length < size) None else Some(encodeToken(keys.last))
  }

  /** Drain the whole listing page by page (driver-side iteration — each
    * page is one distributed top-k job). Test/ops convenience. */
  def allPages(df: DataFrame, keyCol: String, pageSize: Int): Iterator[DataFrame] =
    new Iterator[DataFrame] {
      private var token: Option[String] = None
      private var exhausted = false
      def hasNext: Boolean = !exhausted
      def next(): DataFrame = {
        // ONE distributed job per page: derive the continuation token
        // from this page's own collected keys instead of re-running the
        // identical TakeOrderedAndProject through nextToken (2N -> N
        // jobs for an N-page drain). A listing whose length is an exact
        // multiple of pageSize still ends with one empty page — knowing
        // the full page was the last would cost the extra probe back.
        val p = page(df, keyCol, pageSize, token).localCheckpoint()
        val keys = p.select(col(keyCol).cast("string")).collect().map(_.getString(0))
        token = if (keys.length < clamp(pageSize)) None else Some(encodeToken(keys.last))
        if (token.isEmpty) exhausted = true
        p
      }
    }
}
