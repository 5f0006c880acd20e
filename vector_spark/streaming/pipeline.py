"""Structured Streaming forms of the stateful operators.

Vector's stateful transforms are all timeout-flushed in-memory maps:
`aggregate` drains its series map every interval_ms
(/root/reference/src/transforms/aggregate.rs:18-26, 110-143), `dedupe`
keeps an LRU of seen keys (/root/reference/src/transforms/dedupe.rs:
33-58), `reduce` expires groups after expire_after_ms
(/root/reference/src/transforms/reduce/mod.rs:26-43). Spark expresses
the same contracts declaratively: tumbling `window()` aggregation with
a watermark replaces the flush interval, `dropDuplicatesWithinWatermark`
replaces the LRU (bounded state with an explicit lateness horizon
instead of an event-count cap), and session_window replaces
reduce's gap timeout.

At scale the streaming job is the same plan as the batch job — the
micro-batch engine just runs it repeatedly with state in the state
store; watermarks bound that state so a 10^12-sequence firehose doesn't
accumulate unbounded series state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_aggregate(
    events: DataFrame,
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("source", "severity"),
) -> DataFrame:
    """Vector `aggregate`: tumbling-interval roll-up per metric series.
    The flush interval becomes the window; late events inside the
    watermark still land in their window (Vector would have dropped
    them into the NEXT flush — strictly better semantics)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("n_tok").alias("sum_n_tok"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_n_tok")
    )


def streaming_dedupe(
    events: DataFrame,
    match: tuple[str, ...],
    watermark: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Vector `dedupe` with a time-bounded instead of count-bounded
    cache: duplicates of a key arriving within the watermark horizon are
    dropped; state is evicted automatically past it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(match))


def streaming_parse_aggregate(
    spark,
    input_dir: str,
    schema: str,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The flagship topology as a stream: file-source → parse → route
    (tagged single-pass) → windowed per-lane aggregate. Feed it to
    .writeStream with trigger(availableNow=True) for incremental batch
    over a growing directory — the Spark analogue of Vector's file
    source checkpointing (lib/file-source/src/checkpointer.rs)."""
    from vector_spark.operators.route import Route
    from vector_spark.plans.pipeline import lanes, parse_stage

    stream = spark.readStream.schema(schema).parquet(input_dir)
    parsed = parse_stage(stream).drop("tokens", "message")
    tagged = Route(lanes(), with_unmatched=True).tagged(parsed)
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", interval).alias("w"), "lane", "source", "severity")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("n_tok").alias("sum_n_tok"))
        .select(F.col("w.start").alias("window_start"), "lane", "source", "severity", "n_events", "sum_n_tok")
    )


def streaming_token_frequencies(
    events: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Windowed unigram counts over the token firehose — the streaming
    twin of training/tokens.token_frequencies: tumbling event-time
    windows, one count per (window, token).

    State shape at 10^12-sequence scale: the explode is NARROW (runs
    before the shuffle, map-side combined), so state-store rows per
    window are bounded by the VOCABULARY (~50k), not the stream rate;
    the watermark expires whole windows, so total state is
    vocab × (watermark / interval) rows regardless of how long the
    stream runs. Late tokens inside the watermark still land in their
    window."""
    ex = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col), F.explode(tokens_col).alias("token")
    )
    return (
        ex.groupBy(F.window(ts_col, interval).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "token", "n")
    )


def streaming_reduce_ends_when(
    events,
    group_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    terminator=None,
    timeout_ms: int = 30_000,
):
    """Vector `reduce` with `ends_when` (condition-bounded collapse,
    /root/reference/src/transforms/reduce/mod.rs:26-43, 221-257) and the
    general custom-stateful contract behind the lua/runtime transforms
    (/root/reference/lib/vector-core/src/transform/runtime_transform.rs):
    arbitrary per-group state, 0..N emissions, timers.

    Spark: applyInPandasWithState. State = (n, total) per group;
    a terminator row closes the run and emits one merged event;
    `timeout_ms` mirrors reduce's expire_after_ms for groups whose
    terminator never arrives (processing-time timer flush).

    Rows inside a micro-batch are sorted by ``order_col`` before
    folding — Vector's ordering is arrival order within one stream,
    which a shuffled group has to re-establish explicitly.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if terminator is None:
        terminator = lambda pdf: pdf["event_type"] == "purchase"  # noqa: E731

    out_schema = f"{group_col} long, n_events long, total double, closed_by string"
    state_schema = "n long, total double"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (gid,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {group_col: [gid], "n_events": [n], "total": [total], "closed_by": ["timeout"]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            is_term = terminator(pdf)
            for val, t in zip(pdf[value_col], is_term):
                n += 1
                total += float(val)
                if t:
                    out_rows.append((gid, n, total, "ends_when"))
                    n, total = 0, 0.0
        if n > 0:
            state.update((n, total))
            state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[group_col, "n_events", "total", "closed_by"])

    return events.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )
