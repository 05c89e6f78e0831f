"""Streaming-window query registry (batch-mode checkable).

The window operators (stream/windows.py) are mode-agnostic: the same
transform runs on a static DataFrame (here, for the DuckDB oracle) and
on a watermarked readStream (tests/test_streaming.py). Oracles express
windows via epoch-grid arithmetic (origin-independent, identical to
Spark's epoch-aligned windows) and sessions via gaps-and-islands SQL
(FIXTURES.md oracle notes).
"""

from __future__ import annotations

from .registry_util import QueryDef, t
from .stream import windows as W

_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _bucket(sec: int, src: str = "ts") -> str:
    return f"CAST(floor(epoch({src}) / {sec}) AS BIGINT) * {sec}"


def _to_ts(expr: str) -> str:
    return f"TIMESTAMP '1970-01-01' + ({expr}) * INTERVAL 1 SECOND"


_CENTS_SUM = "sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0"


def _window_tumbling(spark, sf_dir):
    """Tumbling 5-min windows (batch form of the streaming aggregate)."""
    return W.tumbling_counts(t(spark, sf_dir, "events"))


_TUMBLING_SQL = f"""
SELECT strftime({_to_ts(_bucket(300))}, '{_TS_FMT}') AS window_start,
       event_type, count(*) AS n, {_CENTS_SUM} AS sum_value
FROM events GROUP BY 1, 2
"""


def _window_sliding(spark, sf_dir):
    """Sliding 10-min windows every 5 min — each event in 2 windows."""
    return W.sliding_counts(t(spark, sf_dir, "events"))


_SLIDING_SQL = f"""
WITH w AS (
  SELECT {_bucket(300)} - off AS wstart
  FROM events, (VALUES (0), (300)) o(off))
SELECT strftime({_to_ts('wstart')}, '{_TS_FMT}') AS window_start, count(*) AS n
FROM w GROUP BY wstart
"""


def _window_topk(spark, sf_dir):
    """Top-2 event types per 15-min tumbling window (trending items);
    streaming parity via foreachBatch ranking — see test_streaming."""
    return W.windowed_type_topk(t(spark, sf_dir, "events"))


_WINDOW_TOPK_SQL = f"""
WITH agg AS (
  SELECT {_bucket(900)} AS wstart, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY wstart
                               ORDER BY n DESC, event_type) AS rnk
  FROM agg)
SELECT strftime({_to_ts('wstart')}, '{_TS_FMT}') AS window_start,
       event_type, n, rnk
FROM r WHERE rnk <= 2
"""


def _window_session(spark, sf_dir):
    """Per-user 30-min-gap session windows (F.session_window in batch)."""
    return W.session_stats(t(spark, sf_dir, "events"))


_SESSION_SQL = f"""
WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
y AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM x)
SELECT user_id,
       strftime(min(ts), '{_TS_FMT}') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '{_TS_FMT}') AS session_end,
       count(*) AS n_events, {_CENTS_SUM} AS sum_value
FROM y GROUP BY user_id, sid
"""


def _stream_watermark_drop(spark, sf_dir):
    """Watermark late-data drop, micro-batch-faithful batch simulation
    (round-8 verdict item 2) — see stream/windows.watermark_drop_sim."""
    return W.watermark_drop_sim(t(spark, sf_dir, "events"))


# identical integer-micros arithmetic, relationally: jittered arrival
# hour = micro-batch; watermark for batch B = max event-us of batches
# < B minus 10 min; first batch unfiltered (NULL watermark)
_WATERMARK_DROP_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS us,
         (('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
          % 1800) * 1000000 AS jit_us
  FROM events),
b AS (SELECT us, (us + jit_us) // 3600000000 AS batch FROM e),
bm AS (SELECT batch, max(us) AS bmax_us FROM b GROUP BY batch),
wm AS (
  SELECT batch,
         max(bmax_us) OVER (ORDER BY batch
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - 600000000 AS wm_us
  FROM bm),
k AS (
  SELECT (b.us // 300000000) * 300 AS wstart_s,
         CASE WHEN wm.wm_us IS NULL OR b.us >= wm.wm_us THEN 1 ELSE 0 END AS kept
  FROM b JOIN wm USING (batch))
SELECT strftime({_to_ts('wstart_s')}, '{_TS_FMT}') AS window_start,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
FROM k GROUP BY wstart_s
"""


def _stream_session_merge(spark, sf_dir):
    """Session-merge observability: per 30-min session, how many 5-min
    fragments merged — see stream/windows.session_merge_stats."""
    return W.session_merge_stats(t(spark, sf_dir, "events"))


_SESSION_MERGE_SQL = f"""
WITH x AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us,
         event_id
  FROM events),
y AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
              THEN 1 ELSE 0 END AS new_s,
         CASE WHEN prev_us IS NULL OR us - prev_us >= 300000000
              THEN 1 ELSE 0 END AS new_frag
  FROM x),
z AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM y)
SELECT user_id, strftime(min(ts), '{_TS_FMT}') AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(new_frag) AS BIGINT) AS n_fragments
FROM z GROUP BY user_id, sid
"""


def _stream_emit_finalized(spark, sf_dir):
    """Append-mode emission state per tumbling window — see
    stream/windows.emit_finalized_windows."""
    return W.emit_finalized_windows(t(spark, sf_dir, "events"))


_EMIT_FINALIZED_SQL = f"""
WITH a AS (
  SELECT (epoch_us(ts) // 300000000) * 300 AS wstart_s, count(*) AS n
  FROM events GROUP BY 1),
w AS (SELECT max(epoch_us(ts)) - 600000000 AS wm_us FROM events)
SELECT strftime({_to_ts('wstart_s')}, '{_TS_FMT}') AS window_start,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN (wstart_s + 300) * 1000000 <= wm_us
                 THEN 1 ELSE 0 END AS INT) AS finalized
FROM a, w
"""


STREAM_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in [
        QueryDef("window_tumbling", _window_tumbling, _TUMBLING_SQL),
        QueryDef("window_sliding", _window_sliding, _SLIDING_SQL),
        QueryDef("window_session", _window_session, _SESSION_SQL),
        QueryDef("window_topk", _window_topk, _WINDOW_TOPK_SQL),
        QueryDef(
            "stream_watermark_drop",
            _stream_watermark_drop,
            _WATERMARK_DROP_SQL,
            ("stream",),
        ),
        QueryDef(
            "stream_session_merge",
            _stream_session_merge,
            _SESSION_MERGE_SQL,
            ("stream",),
        ),
        QueryDef(
            "stream_emit_finalized",
            _stream_emit_finalized,
            _EMIT_FINALIZED_SQL,
            ("stream",),
        ),
    ]
}
