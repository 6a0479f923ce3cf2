package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long hash keys for string-heavy equi-joins.
  *
  * The reconciliation/replication legs all join on storage paths — long,
  * high-entropy UTF8 strings. Sort-merge and shuffle-hash joins pay for
  * those strings on every key comparison. Prepending `xxhash64(keys)` as
  * a LEADING equi-join key keeps the join EXACT (the original columns
  * remain join keys, so a 64-bit collision cannot produce a wrong match)
  * while letting every sort/probe comparison short-circuit on one long:
  * string bytes are only touched for rows whose hashes already collide —
  * i.e. (virtually always) true matches.
  */
object JoinKeys {

  private val KeyName = "__graft_join_pk"

  /** Join `left` with `right` on `keys`, led by a 64-bit hash of the key
    * columns. Output schema and row set are identical to
    * `left.join(right, keys, how)`. The helper column name is namespaced
    * and guarded — a caller column with the same name would be silently
    * overwritten and then dropped, corrupting the equivalence contract. */
  def hashKeyedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    how: String): DataFrame = {
    require(!left.columns.contains(KeyName) && !right.columns.contains(KeyName),
      s"input already carries reserved column $KeyName")
    val l = left.withColumn(KeyName, xxhash64(keys.map(col): _*))
    val r = right.withColumn(KeyName, xxhash64(keys.map(col): _*))
    l.join(r, KeyName +: keys, how).drop(KeyName)
  }
}
