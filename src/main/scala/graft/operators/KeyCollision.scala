package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fingerprint key-collision clustering (the OpenRefine "cluster &
  * edit" workhorse): values that normalize to the same fingerprint —
  * lowercase, punctuation stripped, tokens deduplicated and SORTED —
  * are the same real-world thing typed differently ("Acme Corp.",
  * "acme corp", "Corp Acme"). Each cluster proposes a CANONICAL
  * spelling: its most frequent original value (ties to the smallest),
  * the merge target a cleanup pass rewrites to.
  *
  * This is the cheap, high-precision tier of the name-cleanup ladder —
  * token-order/case/punctuation variants collapse exactly, no
  * threshold to tune — below [[RecordLinkage]]'s blocked Jaro-Winkler
  * (typos) and [[graft.llm.EditSim]] (bounded edit distance).
  *
  * Scale shape: the fingerprint is ONE codegen'd projection (no
  * shuffle); clustering is a groupBy on (fingerprint, value) — map-
  * side combined, so a billion rows of the same spelling arrive as one
  * partial — then a per-fingerprint max_by argmax on the DISTINCT
  * spellings (tiny) and a keys-only equi-join back. Values never cross
  * a shuffle more than once. */
object KeyCollision {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** The normalization: lowercase → non-alphanumerics to spaces →
    * split → drop empties → distinct → sort → rejoin. ASCII-oriented
    * (the OpenRefine convention; Unicode-aware folding belongs to a
    * collation pass upstream). */
  def fingerprint(c: Column): Column =
    array_join(array_sort(array_distinct(filter(
      split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
      x => x =!= ""))), " ")

  /** @param idCol   row identity (carried through)
    * @param textCol the messy value column
    * @param minClusterSize only fingerprints shared by at least this
    *                many DISTINCT spellings are reported (1 reports
    *                every row; the default 2 reports only rows where a
    *                merge decision actually exists)
    * @return (idCol, textCol, fingerprint, cluster_size, canonical) —
    *         cluster_size counts distinct spellings, canonical is the
    *         most frequent spelling (count desc, value asc) */
  def clusters(df: DataFrame, idCol: String, textCol: String,
               minClusterSize: Int = 2): DataFrame = {
    Seq(idCol, textCol).foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(minClusterSize >= 1,
      s"minClusterSize must be >= 1, got $minClusterSize")
    graft.llm.Guards.requireFreshColumns(df,
      Seq("fingerprint", "cluster_size", "canonical", "__n"),
      "KeyCollision.clusters")
    val rows = df.where(q(textCol).isNotNull)
      .withColumn("fingerprint", fingerprint(q(textCol)))
      .where(col("fingerprint") =!= "")
    // distinct spellings per fingerprint with occurrence counts —
    // map-side combined, the only full-data shuffle
    val spellings = rows.groupBy(col("fingerprint"), q(textCol))
      .agg(count(lit(1)).as("__n"))
    // canonical on the (tiny) distinct-spelling frame: the spellings
    // tying the max count, then the smallest — semi-join + min rather
    // than max_by(struct), whose struct ordering would tie-break
    // toward the LARGEST value
    val maxN = spellings.groupBy(col("fingerprint"))
      .agg(max(col("__n")).as("__n"))
    val canon = spellings.join(maxN, Seq("fingerprint", "__n"))
      .groupBy(col("fingerprint"))
      .agg(min(col(textCol)).as("canonical"))
    val sizes = spellings.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("cluster_size"))
      .where(col("cluster_size") >= minClusterSize)
    rows.select(q(idCol), q(textCol), col("fingerprint"))
      .join(sizes, Seq("fingerprint"))
      .join(canon, Seq("fingerprint"))
      .select(q(idCol), q(textCol), col("fingerprint"),
        col("cluster_size"), col("canonical"))
  }
}
