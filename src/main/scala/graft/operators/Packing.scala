package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE-PACKING AND CHUNKING CENSUSES — the two layout decisions a
  * training-data pipeline makes between "clean corpus" and "token
  * stream", each with a cost this operator MEASURES instead of assumes:
  *
  *   - `packCensus`: concat-then-chunk packing (the GPT-style layout —
  *     documents concatenated in a fixed order, the stream cut every
  *     `budget` tokens). Zero padding except the final tail, but every
  *     cut FRAGMENTS the document that straddles it, and fragmented
  *     context is the quality cost of this packer. Per budget: how many
  *     sequences, how many documents get fragmented, the tail padding.
  *   - `chunkCensus`: per-document sliding-window chunking (the RAG /
  *     embedding layout — windows of `size` tokens advancing by
  *     `size − overlap`). No document ever crosses a chunk, but every
  *     overlapped token is READ twice; the expansion permyriad is the
  *     compute/storage cost of the overlap knob.
  *
  * Both are sweeps in the q293/q299 knob-instrument discipline: the
  * expensive input pass happens ONCE (packCensus: the global document
  * offset via the two-phase range-partitioned prefix sum proven in
  * VocabGrowth.heapsCurve — phase 1 runs per range partition, phase 2's
  * window rides a partition-COUNT frame; chunkCensus: one token-count
  * scan), and each config re-buckets the cached frame with pure
  * arithmetic (the q295 ladder discipline).
  *
  * Integer-exact throughout: offsets, ceil-divisions ((x + d − 1) DIV d
  * on non-negative x), and truncating-permyriad readouts — both engines
  * replay them bit-for-bit. Fragmentation of doc (o, t) at budget B is
  * `o DIV B ≠ (o + t − 1) DIV B` — the first and last token land in
  * different sequences.
  */
object Packing {

  /** Concat-then-chunk census. Input: one row per document with its
    * token count (order = `idCol` ascending — the deterministic concat
    * order). Output: one row per budget — n_docs, n_tokens, n_seqs,
    * frag_docs, frag_pm (share of nonempty docs fragmented),
    * oversize_docs (t > budget: fragmented no matter the offset),
    * tail_pad (padding tokens in the final sequence). Zero-token docs
    * count in n_docs but cannot fragment. */
  def packCensus(docs: DataFrame, idCol: String, tokenCountCol: String,
                 budgets: Seq[Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1), "budgets >= 1")
    val counts = docs.select(col(idCol).as("_id"),
      col(tokenCountCol).cast("long").as("_t"))
    // global offset of each doc = tokens before it in _id order: the
    // two-phase range-partitioned prefix sum (heapsCurve's fixed form —
    // the r8 scale-killer lesson: NEVER a global-window running sum).
    val local = counts.repartitionByRange(col("_id"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_ls",
        sum(col("_t")).over(Window.partitionBy(col("_pid")).orderBy(col("_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true) // pins the sampled range boundaries AND
                             // feeds every budget's census
    val partOff = local.groupBy(col("_pid")).agg(sum(col("_t")).as("_pt"))
      .withColumn("_po",
        sum(col("_pt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_pt"))
      .select(col("_pid"), col("_po"))
    val off = local.join(broadcast(partOff), "_pid")
      .select(col("_t"), (col("_po") + col("_ls") - col("_t")).as("_o"))
      .localCheckpoint(true) // each budget re-buckets these offsets
    budgets.map { b =>
      off.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("_t")), lit(0L)).as("n_tokens"),
          sum(when(col("_t") > 0 &&
              expr(s"_o DIV $b") =!= expr(s"(_o + _t - 1) DIV $b"), 1L)
            .otherwise(0L)).as("frag_docs"),
          sum(when(col("_t") > b, 1L).otherwise(0L)).as("oversize_docs"),
          sum(when(col("_t") > 0, 1L).otherwise(0L)).as("_nonempty"))
        .select(lit(b).as("budget"), col("n_docs"), col("n_tokens"),
          expr(s"(n_tokens + ${b - 1}) DIV $b").as("n_seqs"),
          col("frag_docs"),
          expr("CAST(10000 * frag_docs DIV nullif(_nonempty, 0) AS BIGINT)")
            .as("frag_pm"),
          col("oversize_docs"),
          expr(s"(n_tokens + ${b - 1}) DIV $b * $b - n_tokens").as("tail_pad"))
    }.reduce(_.unionByName(_)).orderBy("budget")
  }

  /** Sliding-window chunk census. For a doc of t tokens at (size,
    * overlap): chunks start every `size − overlap` tokens, so
    * n_chunks = 1 + ceil((t − size)/(size − overlap)) when t > size,
    * 1 when 0 < t ≤ size, 0 when t = 0; tokens read (with overlap
    * re-reads) = t + (n_chunks − 1)·overlap. Output per config:
    * n_docs (nonempty), n_chunks, n_tokens, tokens_read,
    * expansion_pm = 10⁴·tokens_read DIV n_tokens, single_chunk_docs. */
  def chunkCensus(docs: DataFrame, tokenCountCol: String,
                  configs: Seq[(Long, Long)]): DataFrame = {
    require(configs.nonEmpty, "at least one (size, overlap) config")
    configs.foreach { case (sz, ov) =>
      require(sz >= 1 && ov >= 0 && ov < sz,
        s"need 0 <= overlap < size, got ($sz, $ov)")
    }
    val t = docs.select(col(tokenCountCol).cast("long").as("_t"))
      .localCheckpoint(true) // one token-count scan feeds every config
    configs.map { case (sz, ov) =>
      val stride = sz - ov
      val nChunks: Column =
        when(col("_t") <= 0, lit(0L))
          .when(col("_t") <= sz, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(_t - $sz + ${stride - 1}) DIV $stride"))
      t.select(col("_t"), nChunks.as("_nc"))
        .agg(
          sum(when(col("_t") > 0, 1L).otherwise(0L)).as("n_docs"),
          coalesce(sum(col("_t")), lit(0L)).as("n_tokens"),
          coalesce(sum(col("_nc")), lit(0L)).as("n_chunks"),
          coalesce(sum(col("_t") +
            (col("_nc") - when(col("_nc") > 0, 1L).otherwise(0L)) * ov),
            lit(0L)).as("tokens_read"),
          sum(when(col("_nc") === 1, 1L).otherwise(0L))
            .as("single_chunk_docs"))
        .select(lit(sz).as("chunk_size"), lit(ov).as("overlap"),
          col("n_docs"), col("n_tokens"), col("n_chunks"),
          col("tokens_read"),
          expr("CAST(10000 * tokens_read DIV nullif(n_tokens, 0) AS BIGINT)")
            .as("expansion_pm"),
          col("single_chunk_docs"))
    }.reduce(_.unionByName(_)).orderBy("chunk_size", "overlap")
  }
}
