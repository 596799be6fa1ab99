"""Tiled (pre-aggregated) point-in-time lookup — the reference's tiling
design re-expressed Spark-first (reference
src/runtime/operators/window/state/tiles.rs:15-118: multi-granularity
pre-aggregated buckets so long windows never rescan raw rows for the window
interior, only the edges).

Here the tile store is a plain DataFrame/table: per (key, time-bucket)
partial aggregates (count, exact cents sum, min, max). A request window
[rts - W, rts] is answered by

  interior: tile buckets fully inside the window — an equi-join on
            (key, bucket id) after exploding each request into its interior
            bucket ids (W/G rows per request);
  edges:    raw rows in the two partial buckets at the window boundaries —
            an equi-join on (key, edge bucket id) + timestamp filter.

Per-request work is O(W/G tiles + edge rows) instead of O(rows in window) —
for a 30-day window at 1-minute granularity that's 43k tile rows vs millions
of raw rows. All combining arithmetic is exact integers, so results are
bit-identical to the unfiltered scan (asserted against the naive
point_in_time_lookup and the DuckDB oracle).

At 100 TB the tile table is maintained incrementally by the streaming write
path (a windowed groupBy — trivially incremental) and is itself partitioned
by key hash; request batches join against it with standard shuffle pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.window import RangeFrame, interval_to_micros


def build_tiles(
    events: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    value_col: str,
    granularity: str = "1 minute",
) -> DataFrame:
    """Tile table: per (key, bucket) → n, cents sum, min, max."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    g = interval_to_micros(granularity)
    return (
        events.withColumn("__b", (F.unix_micros(F.col(ts_col)) / F.lit(g)).cast("long"))
        .groupBy(*keys, "__b")
        .agg(
            F.count(value_col).alias("t_cnt"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("t_cents"),
            F.min(value_col).alias("t_min"),
            F.max(value_col).alias("t_max"),
        )
    )


class TiledFeatureService:
    """Request-serving over TILED state — the reference's "queryable state"
    loop (README feature list + window_request_operator.rs): the streaming
    write path maintains the tile table (``stream_build_tiles``), and point
    lookups answer from interior tiles + raw edge rows without rescanning
    the window. Duck-typed to ``FeatureService`` (key_cols / ts_col /
    get_features), so ``api.serving.FeatureServer`` serves it over HTTP
    unchanged."""

    def __init__(
        self,
        events: DataFrame,
        tiles: DataFrame,
        key_cols,
        ts_col: str,
        value_col: str,
        frame: RangeFrame,
        granularity: str = "1 minute",
        cache: bool = True,
    ):
        self.events = events
        self.tiles = tiles
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.ts_col = ts_col
        self.value_col = value_col
        self.frame = frame
        self.granularity = granularity
        self.cache = cache
        self._cached = False

    def _ensure_cached(self) -> None:
        # pin the tile table AND the raw edge rows once — every request
        # batch after the first reads cached blocks instead of re-scanning
        # (and re-aggregating, when tiles were derived) the event log
        if self.cache and not self._cached:
            self.tiles = self.tiles.persist()
            self.events = self.events.persist()
            self._cached = True

    def close(self) -> None:
        if self._cached:
            self.tiles.unpersist()
            self.events.unpersist()
            self._cached = False

    def lookup(self, requests: DataFrame, request_id_col: str = "request_id") -> DataFrame:
        self._ensure_cached()
        return tiled_lookup(
            self.events,
            requests,
            key_cols=self.key_cols,
            ts_col=self.ts_col,
            value_col=self.value_col,
            frame=self.frame,
            granularity=self.granularity,
            request_id_col=request_id_col,
            tiles=self.tiles,
        )

    def get_features(self, spark, points: list[tuple]) -> list[dict]:
        """points = [(request_id, key..., ts)] → list of feature dicts."""
        cols = ["request_id", *self.key_cols, self.ts_col]
        req = spark.createDataFrame(points, cols)
        return [r.asDict() for r in self.lookup(req).collect()]


def tiled_lookup(
    events: DataFrame,
    requests: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    value_col: str,
    frame: RangeFrame,
    granularity: str = "1 minute",
    request_id_col: str = "request_id",
    tiles: DataFrame | None = None,
) -> DataFrame:
    """COUNT/SUM(cents)/MIN/MAX over [rts - W, rts] per request, via tiles +
    edge rows. Returns request_id, keys, cnt/sum/min/max columns."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    g = interval_to_micros(granularity)
    w = frame.micros
    if tiles is None:
        tiles = build_tiles(events, keys, ts_col, value_col, granularity)

    req = requests.select(
        request_id_col,
        *keys,
        F.unix_micros(F.col(ts_col)).alias("__rts"),
    ).withColumns(
        {
            "__lo": F.col("__rts") - F.lit(w),
            # interior bucket range: bG > lo and (b+1)G <= rts + 1
            "__b_first": (F.floor((F.col("__rts") - F.lit(w)) / F.lit(g)) + 1).cast("long"),
            "__b_last": (F.floor((F.col("__rts") + 1) / F.lit(g)) - 1).cast("long"),
        }
    )

    interior = (
        req.filter(F.col("__b_first") <= F.col("__b_last"))
        .select(
            request_id_col,
            *keys,
            F.explode(F.sequence("__b_first", "__b_last")).alias("__b"),
        )
        .join(tiles, keys + ["__b"])
        .groupBy(request_id_col)
        .agg(
            F.sum("t_cnt").alias("i_cnt"),
            F.sum("t_cents").alias("i_cents"),
            F.min("t_min").alias("i_min"),
            F.max("t_max").alias("i_max"),
        )
    )

    ev = events.select(
        *keys,
        F.unix_micros(F.col(ts_col)).alias("__ets"),
        F.col(value_col).alias("__v"),
        (F.unix_micros(F.col(ts_col)) / F.lit(g)).cast("long").alias("__b"),
    )
    # edge buckets: the (≤2) partially-covered buckets at the window bounds
    edge_req = req.select(
        request_id_col,
        *keys,
        "__lo",
        "__rts",
        "__b_first",
        "__b_last",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("__lo") / F.lit(g)).cast("long"),
                    F.floor(F.col("__rts") / F.lit(g)).cast("long"),
                )
            )
        ).alias("__b"),
    ).filter(  # skip buckets already counted as interior
        (F.col("__b") < F.col("__b_first")) | (F.col("__b") > F.col("__b_last"))
    )
    edges = (
        edge_req.join(ev, keys + ["__b"])
        .filter((F.col("__ets") >= F.col("__lo")) & (F.col("__ets") <= F.col("__rts")))
        .groupBy(request_id_col)
        .agg(
            F.count("__v").alias("e_cnt"),
            F.sum(F.round(F.col("__v") * 100).cast("long")).alias("e_cents"),
            F.min("__v").alias("e_min"),
            F.max("__v").alias("e_max"),
        )
    )

    combined = (
        req.select(request_id_col, *keys)
        .join(interior, request_id_col, "left")
        .join(edges, request_id_col, "left")
    )
    cnt = F.coalesce("i_cnt", F.lit(0)) + F.coalesce("e_cnt", F.lit(0))
    cents = F.when(
        cnt > 0,
        F.coalesce("i_cents", F.lit(0)) + F.coalesce("e_cents", F.lit(0)),
    )
    return combined.select(
        request_id_col,
        *keys,
        cnt.alias("cnt"),
        (cents / F.lit(100.0)).alias("sum_value"),
        F.least(
            F.coalesce("i_min", F.col("e_min")), F.coalesce("e_min", F.col("i_min"))
        ).alias("min_value"),
        F.greatest(
            F.coalesce("i_max", F.col("e_max")), F.coalesce("e_max", F.col("i_max"))
        ).alias("max_value"),
    )


def estimate_rows_per_key_window(
    events: DataFrame, key_cols: str | list[str], ts_col: str, frame: RangeFrame
) -> float:
    """Expected raw rows inside one (key, window) — the quantity that
    decides naive vs tiled serving. ONE aggregation pass: total rows,
    approx distinct keys (one-pass HLL — never a distinct shuffle), event-
    time span; density ≈ rows/keys × window/span."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    row = events.agg(
        F.count("*").alias("n"),
        F.approx_count_distinct(F.struct(*keys)).alias("k"),
        F.min(ts_col).alias("lo"),
        F.max(ts_col).alias("hi"),
    ).collect()[0]
    if not row["n"] or row["lo"] is None:
        return 0.0
    span = max((row["hi"] - row["lo"]).total_seconds() * 1_000_000, 1.0)
    w = min(float(frame.micros), span)
    return (row["n"] / max(row["k"], 1)) * (w / span)


def auto_feature_service(
    events: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    value_col: str,
    frame: RangeFrame,
    granularity: str = "1 minute",
    threshold: float = 512.0,
    cache: bool = True,
):
    """Pick the serving plan by MEASURED key density (SCALING.md's request-
    serving table): below ``threshold`` expected rows per key-window the
    naive union+window plan wins (one shuffle, per-key sorts over few rows);
    above it the tiled plan's O(window/granularity + edges) per-request cost
    beats the naive path's O(rows-in-window) sort. Returns a duck-typed
    service (``lookup``/``get_features``) answering COUNT / SUM / MIN / MAX
    over [ts - W, ts]; both plans are exact and bit-identical
    (tests/test_tiles.py), so the choice is purely a cost call — inspect it
    via ``.chosen`` / ``.est_rows_per_key_window``.
    """
    from volga_spark.operators.request import FeatureService, masked

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    density = estimate_rows_per_key_window(events, keys, ts_col, frame)
    if density >= threshold:
        svc = TiledFeatureService(
            events.select(*keys, ts_col, value_col),
            build_tiles(events, keys, ts_col, value_col, granularity),
            key_cols=keys,
            ts_col=ts_col,
            value_col=value_col,
            frame=frame,
            granularity=granularity,
            cache=cache,
        )
        svc.chosen = "tiled"
    else:

        def agg_builder(w):
            mv = masked(value_col)
            return {
                "cnt": F.count(mv).over(w),
                "sum_value": (
                    F.sum(F.round(mv * 100).cast("long")).over(w) / F.lit(100.0)
                ),
                "min_value": F.min(mv).over(w),
                "max_value": F.max(mv).over(w),
            }

        svc = FeatureService(
            events.select(*keys, ts_col, value_col),
            key_cols=keys,
            ts_col=ts_col,
            frame=frame,
            agg_builder=agg_builder,
            cache=cache,
        )
        svc.chosen = "naive"
    svc.est_rows_per_key_window = density
    return svc
