"""Offline feature retrieval: point-in-time-correct training-set export.

The defining batch operation of a feature platform (the reference's
domain): given a SPINE of (entity keys, event timestamp[, label]) rows,
attach to each row the value every feature view had AT THAT MOMENT — never
later (no label leakage), and never staler than the view's TTL. This is
`get_historical_features` in Feast-style stores; the reference serves the
same point-in-time semantics on its request path
(reference src/runtime/operators/window/window_request_operator.rs), while
this module is the batch/export twin over the same as-of machinery.

Each feature view resolves with one `asof_join` (backward, TTL as
tolerance) — the single-shuffle sort-merge carry plan of
``operators/asof.py``. N views = N sequential as-of joins, each shuffling
only (spine ⊕ that view's feature rows) on the entity key — there is no
N-way pre-join blowup, and views with different keys partition
independently. At 100 TB: the spine is typically the small side (training
examples), feature histories the large; the carry plan streams both sorted
sides once.

Feature names are prefixed ``<view>__<column>`` so views can't collide —
the flattened wide-row layout training pipelines expect.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from volga_spark.operators.asof import asof_join


@dataclass
class FeatureView:
    """A versioned feature table: entity keys, event-time column, and the
    feature columns to expose. ``ttl_us`` bounds staleness — a feature
    older than the TTL at the spine timestamp resolves to NULL (the
    train/serve-consistent treatment of expired state)."""

    name: str
    source: DataFrame
    keys: list[str]
    ts_col: str
    features: list[str] = field(default_factory=list)
    ttl_us: int | None = None

    def __post_init__(self) -> None:
        if not self.features:
            self.features = [
                c
                for c in self.source.columns
                if c not in self.keys and c != self.ts_col
            ]


def get_historical_features(
    spine: DataFrame,
    spine_ts: str,
    views: list[FeatureView],
) -> DataFrame:
    """Attach every view's point-in-time feature values to the spine.

    For each spine row and each view: the view row with the same entity
    key and the LATEST ``ts_col`` ≤ the spine timestamp (ties inclusive),
    NULL if none exists or the match is older than ``ttl_us``. Spine rows
    and columns pass through unchanged; added columns are
    ``<view.name>__<feature>``.
    """
    seen: set[str] = set()
    out = spine
    for v in views:
        if v.name in seen:
            raise ValueError(f"duplicate feature view name {v.name!r}")
        seen.add(v.name)
        renamed = v.source.select(
            *v.keys,
            v.ts_col,
            *[
                v.source[c].alias(f"{v.name}__{c}")
                for c in v.features
            ],
        )
        out = asof_join(
            out,
            renamed,
            on=v.keys,
            left_ts=spine_ts,
            right_ts=v.ts_col,
            value_cols=[f"{v.name}__{c}" for c in v.features],
            direction="backward",
            tolerance_us=v.ttl_us,
        )
    return out
