"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Plays the role of the reference's committed sample corpus
(``sample/orig/*`` 16 images → ``sample/proc/*`` golden outputs): a seeded,
reproducible input→golden pairing, in the text domain, at parameterized
scale.  No wall-clock, no external data; same seed ⇒ byte-identical corpus.

Payload kinds mirror the reference's four sample flavors
(01-col-with-border.png, 03-col-wo-border.png, 02-row.png, 02.jpg):
``plain`` (40%), ``html_page`` (25%), ``md_table`` (15%), ``pdf_layout``
(15%), ``noisy`` (5%).

Skew is mandatory (SURVEY.md §7 hard-point 4): conversation lengths are
heavy-tailed — 90% short (2-20 turns), 9% medium (50-200), 1% long
(2k-20k, scaled down at tiny SF) — otherwise salted repartition is
untested theater.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List, Tuple

_WORDS = (
    "the quick brown fox jumps over lazy dog table row column cell value "
    "query plan shuffle partition batch arrow vector spark engine extract "
    "content main page text data turn agent tool browser result answer "
    "model token stream commit snapshot lineage metric golden oracle"
).split()

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

ROLES = ("user", "assistant", "tool")
TOOLS = ("browser", "pdf_reader", "shell", "")

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _rng_for(conv_id: str, turn_idx: int) -> random.Random:
    """Per-turn RNG seeded from the key — payload content is a pure function
    of (conv_id, turn_idx), independent of generation order/partitioning."""
    seed = int.from_bytes(
        hashlib.sha256(f"{conv_id}:{turn_idx}".encode()).digest()[:8], "big"
    )
    return random.Random(seed)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _prose(rng: random.Random, paras: int) -> str:
    return "\n\n".join(
        ". ".join(_sentence(rng, rng.randint(5, 14)) for _ in range(rng.randint(2, 5))) + "."
        for _ in range(paras)
    )


def _html_page(rng: random.Random) -> str:
    art = _prose(rng, rng.randint(1, 3))
    table = ""
    if rng.random() < 0.5:
        ncols = rng.randint(2, 5)
        nrows = rng.randint(2, 8)
        rows = []
        for r in range(nrows):
            tds = "".join(
                f"<td>{_sentence(rng, rng.randint(1, 3))}</td>" for _ in range(ncols)
            )
            rows.append(f"<tr>{tds}</tr>")
        table = "<table>" + "".join(rows) + "</table>"
    nav = f"<nav>{_sentence(rng, 6)}</nav>"
    cookie = f'<div class="cookie-banner">{_sentence(rng, 8)}</div>'
    footer = f"<footer>{_sentence(rng, 5)} &copy; 2025</footer>"
    script = f"<script>var x = {rng.randint(0, 999)};</script>"
    return (
        f"<html><head><title>{_sentence(rng, 3)}</title>{script}</head>"
        f"<body>{nav}{cookie}<article><p>{art}</p>{table}</article>{footer}</body></html>"
    )


def _md_table(rng: random.Random) -> str:
    ncols = rng.randint(2, 8)
    nrows = rng.randint(2, 30)
    header = "| " + " | ".join(f"col{c}" for c in range(ncols)) + " |"
    rule = "|" + "|".join(" --- " for _ in range(ncols)) + "|"
    body = [
        "| " + " | ".join(_sentence(rng, rng.randint(1, 2)) for _ in range(ncols)) + " |"
        for _ in range(nrows)
    ]
    pre = _prose(rng, 1)
    post = _prose(rng, 1)
    return pre + "\n\n" + "\n".join([header, rule] + body) + "\n\n" + post


def _pdf_layout(rng: random.Random) -> str:
    ncols = rng.randint(2, 4)
    widths = [rng.randint(8, 16) for _ in range(ncols)]
    npages = rng.randint(1, 3)
    header = "ACME QUARTERLY REPORT"
    footer = "CONFIDENTIAL - PAGE FOOTER"
    pages = []
    for _ in range(npages):
        nrows = rng.randint(3, 12)
        lines = [header, ""]
        lines.append(_sentence(rng, rng.randint(4, 8)))
        lines.append("")
        for _ in range(nrows):
            cells = [
                "-".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 2)))[: w - 2]
                for w in widths
            ]
            lines.append("  ".join(c.ljust(w) for c, w in zip(cells, widths)).rstrip())
        lines.append("")
        lines.append(footer)
        pages.append("\n".join(lines))
    return "\f".join(pages)


def _noisy(rng: random.Random) -> str:
    choice = rng.randint(0, 4)
    if choice == 0:
        return ""
    if choice == 1:
        return "zero\u200bwidth\u200cmixed\ufeff " + _sentence(rng, 5)
    if choice == 2:
        return "line1\r\nline2\rline3\n" + _sentence(rng, 4)
    if choice == 3:
        return "سلام دنیا " + _sentence(rng, 4) + " مخلوط"  # RTL mix (eng+fas analog)
    return _sentence(rng, 2000)  # very long single line


_KIND_CUTS = (("plain", 0.40), ("html_page", 0.65), ("md_table", 0.80), ("pdf_layout", 0.95), ("noisy", 1.0))


def payload_for(conv_id: str, turn_idx: int) -> Tuple[str, str]:
    """(kind, text) for one turn — pure function of the key."""
    rng = _rng_for(conv_id, turn_idx)
    # one ~1 MB outlier per corpus (FIXTURES.md §1: payload sizes 0.1-50 KB,
    # one ~1 MB outlier per SF step) — the Arrow-batch memory-bound test case
    if turn_idx == 0 and conv_id.endswith("-00000000"):
        return "outlier", _sentence(rng, 170_000)
    x = rng.random()
    kind = next(k for k, cut in _KIND_CUTS if x < cut)
    if kind == "plain":
        return kind, _prose(rng, rng.randint(1, 4))
    if kind == "html_page":
        return kind, _html_page(rng)
    if kind == "md_table":
        return kind, _md_table(rng)
    if kind == "pdf_layout":
        return kind, _pdf_layout(rng)
    return kind, _noisy(rng)


def conv_lengths(n_convs: int, seed: int = 42, max_long: int = 20000) -> List[int]:
    """Heavy-tailed conversation lengths: 90% 2-20, 9% 50-200, 1% long."""
    rng = random.Random(seed)
    out = []
    for i in range(n_convs):
        x = rng.random()
        if x < 0.90:
            out.append(rng.randint(2, 20))
        elif x < 0.99:
            out.append(rng.randint(50, 200))
        else:
            out.append(rng.randint(min(2000, max_long), max_long))
    return out


def gen_rows(n_convs: int, seed: int = 42, max_long: int = 2000) -> Iterator[Dict]:
    """Yield transcript rows (FIXTURES.md §1 schema). Deterministic."""
    lengths = conv_lengths(n_convs, seed=seed, max_long=max_long)
    for ci, n_turns in enumerate(lengths):
        conv_id = f"conv-{seed:04d}-{ci:08d}"
        for t in range(n_turns):
            rng = _rng_for(conv_id, t)
            role = ROLES[t % 3] if rng.random() < 0.8 else rng.choice(ROLES)
            tool = rng.choice(TOOLS[:3]) if role == "tool" else ""
            kind, text = payload_for(conv_id, t)
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _EPOCH + timedelta(seconds=ci * 86400 + t * 60),
            }


def gen_pandas(n_convs: int, seed: int = 42, max_long: int = 2000):
    """Corpus as a pandas DataFrame (small SFs / tests)."""
    import pandas as pd

    rows = list(gen_rows(n_convs, seed=seed, max_long=max_long))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
