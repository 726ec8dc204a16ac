"""Custom STATEFUL streaming operator: conversation-scoped boilerplate
stripping over a live transcript stream (``applyInPandasWithState``).

The batch operator (operators/conv_scope.strip_conv_boilerplate) needs the
whole conversation to count repeated lines.  A stream cannot wait for a
conversation to end, so the streaming form keeps per-``conv_id`` state —
the running (line-hash → turns-containing-it) counts and the turns-seen
total — and strips each arriving micro-batch against the counts known SO
FAR ("prefix semantics").  Feed the entire conversation in one batch and
the prefix is the whole conversation: output equals the batch operator
exactly (asserted in tests) — the same AvailableNow == batch pinning used
for the stateless extraction stream.

State is bounded and narrow: distinct line hashes per conversation (the
60-bit md5 family shared with conv_scope/dedup), not text.  At cluster
scale the state store shuffles on conv_id — the one grouping that cannot
be salted (semantics need the conversation) — and state eviction is a
processing-time timeout per conversation (idle conversations age out; a
conversation resuming after eviction restarts its counts, i.e. banning
degrades toward per-suffix, never corrupts).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from table_ocr_spark.functions.normalize import normalize
from table_ocr_spark.operators.conv_scope import _h60

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text_stripped", T.StringType()),
        T.StructField("n_banned_lines", T.IntegerType()),
    ]
)

# per-conv running counts: parallel arrays (hash, turns-containing-it) + n
STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.IntegerType())),
        T.StructField("n_turns", T.IntegerType()),
    ]
)


def _strip_with_state(
    ratio: float, min_turns: int, idle_timeout_ms: int
):
    """Build the (key, batches, state) handler closed over the knobs.

    Cut arithmetic is bit-identical to the batch operator
    (conv_scope._banned_lines): banned = count ≥ max(2, ⌊ratio·n+0.9999⌋),
    only once n ≥ min_turns.
    """

    def handler(
        key: Tuple[str],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            hashes, counts, n_turns = state.get
            seen = dict(zip(hashes, counts))
        else:
            seen, n_turns = {}, 0

        # Two phases per micro-batch: ingest EVERY arriving turn into the
        # counts first, then strip the whole batch with the post-batch
        # banned set.  This makes one-batch ingestion equal the batch
        # operator exactly (banned set from the full conversation, applied
        # to every turn) and gives batch-granular prefix semantics when
        # the conversation arrives incrementally.
        turns = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("turn_idx")
            for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
                norm = normalize(text)
                per_line = [
                    (ln, _h60(s) if s else None)
                    for ln in norm.split("\n")
                    for s in (ln.strip(),)
                ]
                n_turns += 1
                for h in {h for _, h in per_line if h is not None}:
                    seen[h] = seen.get(h, 0) + 1
                turns.append((int(turn_idx), per_line))

        if n_turns >= min_turns:
            cut = max(2, int(ratio * n_turns + 0.9999))
            banned = {h for h, c in seen.items() if c >= cut}
        else:
            banned = set()
        rows = [
            (
                key[0],
                turn_idx,
                "\n".join(ln for ln, h in per_line if h is None or h not in banned),
                len(banned),
            )
            for turn_idx, per_line in turns
        ]

        state.update((sorted(seen.keys()), [seen[h] for h in sorted(seen.keys())], n_turns))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "text_stripped", "n_banned_lines"]
        )

    return handler


def stream_conv_boilerplate(
    src: DataFrame,
    ratio: float = 0.6,
    min_turns: int = 3,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """transcript stream → stripped-turn stream with per-conv state.

    ``src`` is a streaming DataFrame with (conv_id, turn_idx, text).
    ``idle_timeout_ms`` > 0 evicts a conversation's counts after that much
    processing-time inactivity (bounded state at 10^12 turns); 0 keeps
    state for the stream's lifetime (tests, backfills).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        src.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _strip_with_state(ratio, min_turns, idle_timeout_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout,
        )
    )
