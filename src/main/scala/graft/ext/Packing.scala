package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Sequence packing for LLM training (the concat-then-chunk scheme:
  * documents are concatenated in a fixed order and the stream is cut
  * into fixed-length context windows; each document is tagged with the
  * chunk its last token lands in).
  *
  * A single global concat order would serialize the prefix sum through
  * one task, so documents are first salted into `buckets` independent
  * streams by portable hash (deterministic — NOT round-robin by
  * partition, which would change with parallelism): each bucket is
  * packed independently with a window prefix-sum ordered by doc id.
  * One shuffle (bucket, doc_id) total; each bucket's running sum is a
  * linear scan. At 100 TB, buckets ≈ executor count × a few, so every
  * prefix sum is cluster-parallel while chunk utilization stays the
  * same (chunking loses at most one partial window per bucket).
  *
  * Documents longer than `contextLen` contribute `contextLen` tokens
  * (truncation, the common training-prep choice); empty docs contribute
  * 0 and land in the chunk of the running position. */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      contextLen: Int = 2048, buckets: Int = 64): DataFrame = {
    require(contextLen > 0 && buckets > 0)
    val nTok = least(size(TextStats.tokens(TextStats.normalized(col(textCol)))),
      lit(contextLen)).cast("long")
    val staged = docs.select(col(idCol).as("id"), nTok.as("n_tok"),
      pmod(Hashing.hash64(col(idCol)), lit(buckets)).cast("int").as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      // chunk of the doc's LAST token; empty docs take the running chunk
      .withColumn("chunk_id",
        when(col("n_tok") > 0, floor((col("cum_tok") - 1) / contextLen))
          .otherwise(floor(col("cum_tok") / contextLen)))
      .select(col("id"), col("bucket"), col("n_tok"), col("cum_tok"),
        col("chunk_id"))
  }

  /** Pack ENCODED documents into fixed-length training sequences — the
    * materializing sibling of [[packSequences]] (which only plans chunk
    * boundaries from lengths): every token id is actually placed, so
    * the output IS the model input. Each document contributes
    * `ids ++ [eosId]` (the separator convention; empty docs contribute
    * a lone eos, keeping document count recoverable from the stream).
    * Documents are salted into `buckets` independent streams by
    * portable hash of the id (deterministic under any partitioning,
    * same scheme as packSequences); within a bucket the stream order is
    * doc-id order, and the stream is cut every `contextLen` tokens. The
    * last sequence of a bucket may be short (no padding — callers pad
    * or drop).
    *
    * Scale shape: one window prefix-sum per bucket over DOC-level rows
    * (cheap), then a narrow explode to ARRAY-FRAGMENT rows — one row
    * per (doc, chunk-it-spans), i.e. ~n/contextLen + 1 rows per doc,
    * NOT one per token (a first cut shuffled token-level rows and
    * measured 16.6x at 10x volume from the per-row shuffle overhead;
    * fragments carry the same bytes in ~contextLen-fold fewer rows and
    * re-measured linear) — then ONE reassembly shuffle on (bucket,
    * seq). At 100 TB set buckets ≈ a few × executor count: every
    * prefix sum and every reassembly group stays cluster-parallel and
    * no group ever holds more than contextLen tokens. */
  def packTokenIds(encoded: DataFrame, idCol: String, idsCol: String,
      contextLen: Int = 2048, buckets: Int = 64,
      eosId: Long = 3L): DataFrame = {
    require(contextLen > 0 && buckets > 0)
    val L = lit(contextLen.toLong)
    val staged = encoded.select(col(idCol).as("id"),
      concat(col(idsCol), array(lit(eosId))).as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
      .withColumn("bucket",
        pmod(Hashing.hash64(col("id")), lit(buckets)).cast("int"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fragment of __ids that lands in chunk c: global positions
    // [max(start, c*L), min(start + n, (c+1)*L)); __n >= 1 always (eos),
    // so firstChunk..lastChunk is never empty
    val fragments = staged
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
      .withColumn("__frag", explode(transform(
        sequence(expr(s"__start div ${contextLen}L"),
          expr(s"(__start + __n - 1) div ${contextLen}L")),
        c => {
          val fragStart = greatest(c * L - col("__start"), lit(0L))
          val fragEnd = least((c + 1) * L - col("__start"), col("__n"))
          struct(c.as("seq"),
            greatest(col("__start") - c * L, lit(0L)).as("off"),
            slice(col("__ids"), (fragStart + 1).cast("int"),
              (fragEnd - fragStart).cast("int")).as("ids"))
        })))
    fragments
      .groupBy(col("bucket"), col("__frag.seq").as("seq_id"))
      .agg(sort_array(collect_list(struct(col("__frag.off").as("off"),
        col("__frag.ids").as("ids")))).as("__f"))
      .select(col("bucket"), col("seq_id"),
        flatten(transform(col("__f"), f => f.getField("ids")))
          .as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")))
      .select(col("bucket"), col("seq_id"), col("n_tokens"),
        col("token_ids"))
  }

  /** Packing-efficiency report — the utilization check a training-prep
    * pipeline runs BEFORE paying for [[packTokenIds]]: per bucket
    * stream, the doc count, token count (each doc contributes
    * `len(ids) + 1` for its eos, the packTokenIds convention), sequence
    * count at `contextLen`, padded slots, and fill ratio. Exact for the
    * concat-then-chunk scheme, where padding exists only in each
    * bucket's final short sequence: n_seqs = ceil(tokens / L),
    * n_pad = n_seqs * L - tokens.
    *
    * Scale shape: computed from doc LENGTHS alone — one narrow map +
    * one `buckets`-key aggregation (map-side combined). No window, no
    * prefix sum, no token materialization; the 100 TB cost is a scan.
    * All arithmetic is integer except the final fill ratio (one IEEE
    * divide of exact longs — bit-portable). Buckets no doc hashes into
    * are absent from the report. */
  def packingEfficiency(encoded: DataFrame, idCol: String, idsCol: String,
      contextLen: Int = 2048, buckets: Int = 64): DataFrame = {
    require(contextLen > 0 && buckets > 0)
    val L = contextLen.toLong
    encoded.select(
        pmod(Hashing.hash64(col(idCol)), lit(buckets)).cast("int")
          .as("bucket"),
        (size(col(idsCol)) + 1).cast("long").as("__n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .withColumn("n_seqs", expr(s"(n_tokens + ${L - 1}) div $L"))
      .withColumn("n_pad", col("n_seqs") * L - col("n_tokens"))
      .withColumn("fill_r", round(col("n_tokens").cast("double")
        / (col("n_seqs") * L).cast("double"), 6))
  }

  /** Sliding-window chunking WITH overlap — the per-document splitter
    * (RAG indexing / long-doc eval prep), complementing
    * [[packSequences]]' cross-document concat scheme. Chunk starts are
    * 0, stride, 2*stride, …; each chunk takes `window` tokens (the last
    * one may be shorter); a doc with <= window tokens yields exactly one
    * chunk; empty/null docs yield none. Chunk count is
    * 1 + ceil(max(n - window, 0) / stride) — the last chunk always
    * reaches the document's end.
    *
    * Scale shape: pure narrow map (tokenize once, per-doc transform +
    * posexplode) — no shuffle, no state; 100 TB chunks in one pass.
    * Output rows carry the chunk TEXT (callers tokenize downstream);
    * stride < window gives overlap stride..window-1. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val staged = docs
      .select(col(idCol).as("id"),
        TextStats.tokens(TextStats.normalized(col(textCol))).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__nchunks",
        lit(1) + ceil(greatest(col("__n") - window, lit(0)).cast("double") / stride).cast("int"))
    staged
      .select(col("id"), col("__n").as("n_doc_tokens"),
        posexplode(transform(sequence(lit(0), col("__nchunks") - 1), i =>
          concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(window)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens",
        least(lit(window), col("n_doc_tokens") - col("chunk_idx") * stride))
      .select(col("id"), col("chunk_idx"), col("n_doc_tokens"),
        col("n_chunk_tokens"), col("chunk_text"))
  }

  /** Fill-in-the-middle training-example construction (Bavarian et al.
    * 2022, "Efficient Training of Language Models to Fill in the
    * Middle"): each document's token stream is deterministically cut
    * into (prefix, middle, suffix) — the PSM transform an infilling-
    * capable code/text model trains on. Span selection is pure id
    * arithmetic (two independent portable hashes: start = h1 mod n,
    * middle length = 1 + h2 mod (n - start)), so the split is stable
    * across runs, partitionings, and engines — reshuffling the corpus
    * cannot change which spans a model sees. Documents with fewer than
    * 2 tokens keep everything in the prefix (no middle to infill).
    *
    * Output is the per-doc accounting row: segment lengths plus a
    * portable 60-bit hash of each segment's text, which pins the exact
    * token content of all three segments (full extent, not a sample)
    * without shipping the text. Scale shape: one narrow map over the
    * scan — tokenize once, slice thrice, no shuffle, no state. */
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4, the
    * denoising objective): mask ~15% of each document's tokens as
    * length-3 spans replaced by per-span sentinels, emitting the
    * (masked input, target) pair accounting. Deterministic variant of
    * the paper's random procedure, same discipline as [[fimSplit]]:
    * k = max(n/20, 1 if n >= 8) spans (3/20 = the paper's 15% at mean
    * span 3), one span per length-n/k stratum, the span's offset
    * inside its stratum a portable hash of (id, span index) — so
    * stratification guarantees non-overlap (min 1-token gap), and the
    * masking is a pure function of the document id, invariant to
    * partitioning, run order, and engine. Docs under 8 tokens are too
    * short to cut and pass through unmasked (k = 0).
    *
    * Output pins the exact construction without shipping arrays:
    * segment lengths plus full-extent portable hashes of the masked
    * input (keep-segments interleaved with `<Xj>` sentinels) and the
    * target (`<Xj>` + the j-th masked span, concatenated). Scale
    * shape: one narrow map over the scan — tokenize once, slice by
    * arithmetic, no shuffle, no state. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // null text reads as empty (size(null) is -1, which would poison
    // every length downstream; null-text corpora exist)
    val staged = docs.select(col(idCol).as("id"),
        TextStats.tokens(TextStats.normalized(
          coalesce(col(textCol), lit("")))).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      // Column `/` is double division; cast truncation = floor for the
      // non-negative operands here (mirrors DuckDB's `//`)
      .withColumn("__k", greatest((col("__n") / 20L).cast("long"),
        when(col("__n") >= 8L, 1L).otherwise(0L)))
      .withColumn("__strat",
        when(col("__k") > 0, (col("__n") / col("__k")).cast("long"))
          .otherwise(0L))
    // 0-based span starts, one per stratum: j*strat + h(id:j) mod (strat-3)
    val withStarts = staged.withColumn("__starts",
      when(col("__k") > 0,
        transform(sequence(lit(0L), col("__k") - 1L), j =>
          j * col("__strat") + pmod(
            Hashing.hash64(concat(col("id").cast("string"), lit(":"), j.cast("string"))),
            col("__strat") - 3L)))
        .otherwise(array().cast("array<bigint>")))
    val tk = col("__tk")
    val starts = col("__starts")
    def startAt(j: Column) = element_at(starts, (j + 1L).cast("int"))
    val sentinel = (j: Column) =>
      concat(lit("<X"), j.cast("string"), lit(">"))
    // masked input: per stratum the keep-prefix + the sentinel, then the tail
    val maskedBody = flatten(transform(sequence(lit(0L), col("__k") - 1L), j => {
      val p0 = when(j === 0L, lit(1L)).otherwise(startAt(j - 1L) + 4L)
      concat(slice(tk, p0.cast("int"), (startAt(j) - p0 + 1L).cast("int")),
        array(sentinel(j)))
    }))
    val tail = slice(tk,
      when(col("__k") > 0, element_at(starts, col("__k").cast("int")) + 4L)
        .otherwise(lit(1L)).cast("int"),
      when(col("__k") > 0,
          col("__n") - element_at(starts, col("__k").cast("int")) - 3L)
        .otherwise(col("__n")).cast("int"))
    val masked = when(col("__k") > 0, concat(maskedBody, tail)).otherwise(tail)
    val target = when(col("__k") > 0,
        flatten(transform(sequence(lit(0L), col("__k") - 1L), j =>
          concat(array(sentinel(j)),
            slice(tk, (startAt(j) + 1L).cast("int"), lit(3))))))
      .otherwise(array().cast("array<string>"))
    val segH = (seg: Column) => Hashing.hash64(array_join(seg, " "))
    withStarts.select(col("id"), col("__n").as("n_tokens"),
      col("__k").as("n_spans"),
      size(masked).cast("long").as("input_len"),
      size(target).cast("long").as("target_len"),
      segH(masked).as("masked_h"), segH(target).as("target_h"))
  }

  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text reads as empty (same null discipline as spanCorrupt)
    val staged = docs.select(col(idCol).as("id"),
        TextStats.tokens(TextStats.normalized(
          coalesce(col(textCol), lit("")))).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    val h1 = Hashing.hash64(col("id").cast("string"))
    val h2 = Hashing.hash64(concat(col("id").cast("string"), lit(":m")))
    val a = when(col("__n") >= 2, pmod(h1, col("__n").cast("long")))
      .otherwise(col("__n").cast("long"))
    val m = when(col("__n") >= 2,
        lit(1L) + pmod(h2, col("__n").cast("long") - col("__a")))
      .otherwise(lit(0L))
    val segH = (seg: Column) => Hashing.hash64(array_join(seg, " "))
    staged
      .withColumn("__a", a)
      .withColumn("__m", m)
      .select(col("id"), col("__n").cast("long").as("n_tokens"),
        col("__a").as("pre_len"), col("__m").as("mid_len"),
        (col("__n") - col("__a") - col("__m")).as("suf_len"),
        segH(slice(col("__toks"), lit(1), col("__a").cast("int")))
          .as("pre_h"),
        segH(slice(col("__toks"), (col("__a") + 1).cast("int"),
          col("__m").cast("int"))).as("mid_h"),
        segH(slice(col("__toks"), (col("__a") + col("__m") + 1).cast("int"),
          (col("__n") - col("__a") - col("__m")).cast("int"))).as("suf_h"))
  }
}
