"""Deterministic corpus sampling and per-key quotas.

Two curation staples the large-scale pipelines (RefinedWeb/Dolma-style)
apply between scoring and packing:

* **hash sampling** — keep a ~``rate`` fraction of rows, decided by a
  hash of the row's own key, not an RNG: reproducible across runs and
  engines, stable under repartitioning and incremental reruns (a row's
  fate never depends on which other rows are present), and
  salt-rotatable for independent re-draws.  Pure JVM projection filter —
  embarrassingly parallel, no shuffle, pushdown-friendly.
* **per-key caps** — at most ``n`` rows per key (domain/source/site),
  keeping the best by an explicit total order.  The naive form is one
  window over ``partitionBy(key)`` — correct, but a hot key (a crawl
  with 10^9 pages from one domain) serializes through a single window
  partition.  ``cap_per_key`` therefore runs two phases:

  1. rank within ``(key, salt_bucket)`` where the bucket is HASH-derived
     from the row's id (value-derived ⇒ deterministic under recompute)
     and keep ≤ n per bucket — by pigeonhole the global top-n under the
     same total order survives, and any key's survivor count is bounded
     by ``n × prefilter_buckets`` regardless of its raw row count;
  2. the exact window over survivors only.

  Phase 1's shuffle spreads a hot key over ``prefilter_buckets``
  partitions; phase 2's per-key partition holds ≤ n × buckets rows —
  both bounded at 100 TB.  (AQE skew-join splitting does not apply to
  window exchanges, so the salt is load-bearing, not belt-and-braces.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SEP = "\x1f"


def _hash_bucket(key: Column, n_buckets: int, salt: str) -> Column:
    """md5 → leading 60 bits → bucket in [0, n_buckets) — the same
    engine-portable construction as textstats.dataset_split_col (DuckDB:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT % n``)."""
    from table_ocr_spark.operators.textstats import hash60_col

    h = hash60_col(F.concat_ws(_SEP, key.cast("string"), F.lit(salt)))
    return h % n_buckets


def hash_sample_col(
    key: Union[str, Column],
    rate: float,
    salt: str = "",
    n_buckets: int = 1_000_000,
) -> Column:
    """Boolean keep-column: True for a deterministic ~``rate`` fraction
    of keys.  Rows sharing a key co-sample (key on a content fingerprint
    to make duplicates rise or fall together)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    col = F.col(key) if isinstance(key, str) else key
    return _hash_bucket(col, n_buckets, salt) < int(round(rate * n_buckets))


def hash_sample(
    df: DataFrame,
    key: Union[str, Column],
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Filter to the deterministic ~``rate`` sample (see hash_sample_col)."""
    return df.filter(hash_sample_col(key, rate, salt))


def cap_per_key(
    df: DataFrame,
    key: Union[str, Sequence[str]],
    order_by: List[Column],
    id_col: str,
    n: int,
    prefilter_buckets: Optional[int] = 32,
) -> DataFrame:
    """Keep at most ``n`` rows per ``key``, best-first under
    ``order_by + [id_col]`` (the id is appended as the tie-break so the
    order — and therefore the kept set — is total and reproducible).

    ``prefilter_buckets``: phase-1 salt width (None/0 skips the
    prefilter — only sensible when no key can be hot)."""
    keys = [key] if isinstance(key, str) else list(key)
    order = list(order_by) + [F.col(id_col).asc()]
    d = df
    if prefilter_buckets:
        bucket = _hash_bucket(F.col(id_col), prefilter_buckets, "cap")
        w1 = Window.partitionBy(*[F.col(k) for k in keys], bucket).orderBy(*order)
        d = (
            d.withColumn("_cap_rn", F.row_number().over(w1))
            .filter(F.col("_cap_rn") <= n)
            .drop("_cap_rn")
        )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        d.withColumn("_cap_rn", F.row_number().over(w2))
        .filter(F.col("_cap_rn") <= n)
        .drop("_cap_rn")
    )
