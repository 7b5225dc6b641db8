"""Distributed sequence packing: the two-pass (scan) prefix sum.

``q120_sequence_packing`` computes, per source, a running token
prefix-sum ordered by doc_id — a single keyed window. That is correct
but a HOT source (one source owning a large share of the corpus)
serializes into one window partition's sort. The classic distributed
fix, implemented here, is the two-pass scan every parallel-prefix
textbook ships:

1. range-partition the rows by (key, order) so each partition holds a
   contiguous slice of every key's sequence (a hot key spreads over
   MANY partitions);
2. pass 1: per (partition, key) local prefix sums — window state is
   bounded by the partition size, never by the key's total size;
3. the per-(partition, key) totals are a TINY relation (n_partitions x
   n_keys rows); a window over it turns totals into per-slice offsets;
4. pass 2: broadcast the offsets back and add — global prefix sum
   reconstructed exactly, no single-partition sort anywhere.

The result is bit-identical to the one-pass window (integer sums are
associative) while the critical path drops from O(hot key) to
O(partition slice). Reference anchor: north-star packing surface
(q120); the same scan pattern serves any ordered accumulation (byte
offsets for shard manifests, cumulative event counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum_two_pass(
    df: DataFrame,
    *,
    key: str,
    order: str,
    weight: str,
    out: str = "prefix_sum",
    n_chunks: int = 32,
) -> DataFrame:
    """Inclusive per-``key`` prefix sum of ``weight`` ordered by
    ``order``, computed with the two-pass scan. Output schema = input
    + ``out`` column. ``n_chunks`` bounds pass-1 partition count; at
    cluster scale set it to the parallelism you want the hot key
    spread over (the offsets relation stays n_chunks x n_keys — tiny).

    The value is invariant to where the range boundaries land (the
    sampling-based partitioner is nondeterministic): any contiguous
    slicing reconstructs the same global sums.

    Contract: ``order`` must be unique within each ``key`` group (the
    packing use case orders by doc_id, unique by construction). With
    ties, a running-sum prefix is nondeterministic in ANY
    formulation — one-pass window included — because tie order is
    unspecified."""
    sliced = df.repartitionByRange(n_chunks, F.col(key), F.col(order))
    with_pid = sliced.withColumn("_chunk", F.spark_partition_id())
    w_local = (
        Window.partitionBy("_chunk", key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid.withColumn("_local_sum", F.sum(weight).over(w_local))

    totals = local.groupBy("_chunk", key).agg(
        F.sum(weight).alias("_chunk_total")
    )
    w_off = (
        Window.partitionBy(key)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_chunk",
        key,
        F.coalesce(F.sum("_chunk_total").over(w_off), F.lit(0)).alias(
            "_offset"
        ),
    )
    # NULL-safe key equality: groupBy/window both treat a NULL key as
    # its own group, so the offsets relation HAS a NULL-key row — a
    # plain equi-join would silently drop it (ADVICE r7), breaking
    # bit-parity with the one-pass keyed window for NULL-key rows.
    joined = local.alias("l").join(
        F.broadcast(offsets).alias("o"),
        F.col("l._chunk").eqNullSafe(F.col("o._chunk"))
        & F.col(f"l.{key}").eqNullSafe(F.col(f"o.{key}")),
    )
    return joined.withColumn(
        out, F.col("o._offset") + F.col("l._local_sum")
    ).select(*[f"l.{c}" for c in df.columns], out)  # input column order


def pack_sequences(
    sized: DataFrame,
    *,
    key: str,
    order: str,
    weight: str,
    ctx: int,
    n_chunks: int = 32,
) -> DataFrame:
    """Assign each row to the fixed-budget sequence where its first
    token lands: ``seq_id = floor((prefix_sum - weight) / ctx)`` per
    ``key`` in ``order`` — the streaming concat-and-chunk packer, on
    the two-pass scan so hot keys don't serialize."""
    summed = prefix_sum_two_pass(
        sized, key=key, order=order, weight=weight, out="_psum",
        n_chunks=n_chunks,
    )
    return summed.withColumn(
        "seq_id",
        F.floor((F.col("_psum") - F.col(weight)) / float(ctx)).cast("long"),
    ).drop("_psum")


def overlapping_chunks(
    df, id_col: str, text_col: str, *, chunk: int = 32, stride: int = 24
):
    """Overlapping token-window chunking — the retrieval-indexing /
    context-window step between curation and embedding in a RAG or
    long-context pipeline: fixed ``chunk``-token windows every
    ``stride`` tokens (``chunk - stride`` token overlap so no boundary
    sentence is lost), each with an md5 content hash for chunk-level
    dedup/caching downstream. Returns ``[id, chunk_id, start_tok,
    chunk_tokens, chunk_text, chunk_hash]``.

    The start grid ``1, 1+stride, ...`` is capped at
    ``max(1, n - chunk + stride)``: the largest start then exceeds
    ``n - chunk``, so the final window always reaches the last token,
    and a short document still yields its one (short) chunk.

    Scale: map-only — explode a bounded arithmetic sequence, then flat
    slice/concat_ws (codegen-safe; nested HOFs miscompile on Spark
    4.1); ZERO exchanges, so output stays co-partitioned with the scan
    and pipelines into whatever consumes it. ~ceil(n/stride) rows per
    document, linear in corpus size."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(F.col("__toks"))
    starts = df.select(F.col(id_col), toks.alias("__toks")).select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.lit(1), n - F.lit(chunk) + F.lit(stride)),
                F.lit(stride),
            )
        ).alias("__s"),
    )
    chunk_text = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__s"), F.lit(chunk)))
    return starts.select(
        F.col(id_col),
        ((F.col("__s") - 1) / stride).cast("long").alias("chunk_id"),
        F.col("__s").cast("long").alias("start_tok"),
        F.least(F.lit(chunk), F.size(F.col("__toks")) - F.col("__s") + 1)
        .cast("long")
        .alias("chunk_tokens"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_hash"),
    )
