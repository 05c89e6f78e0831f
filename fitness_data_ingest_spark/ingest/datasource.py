"""Spark 4 Python DataSource for the REST ingestion surface (SURVEY.md
§2.1 S1/S2): the scale path promised by ``sources.py``.

The reference fetches one (resource, date) at a time on a single thread
(fitbit_utils.py:185-234). Here the same work-item grid becomes source
partitions — ``partitions()`` returns one ``InputPartition`` per
(resource, date), so a 1000-executor cluster fetches 23k files 1000-wide
with zero driver involvement in the data path.

Filter pushdown (``pushFilters``) reproduces the reference's
source-level predicates (SURVEY §2.2 P3 — the date in the URL path and
the epoch after/before params): EqualTo/In on ``resource`` and
range/equality on ``date`` PRUNE WORK ITEMS — pushed-down filters mean
whole HTTP calls never happen, the strongest form of pushdown. Dates are
ISO strings, so lexicographic compare == chronological compare.

Rate limiting: each partition reader draws from a per-task
``TokenBucket`` (the reference's backpressure, fitbit_utils.py:309-329);
at scale the bucket capacity is divided by executor count.

The transport is injected: tests register the source with the
deterministic ``FixtureSource`` payload (no network, same JSON shape).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date as _date
from datetime import timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from .sources import FixtureSource

DEFAULT_RESOURCES = "heart,steps,calories,distance"


@dataclass
class WorkItem(InputPartition):
    resource: str
    date: str


def _date_seq(start: str, end: str) -> list[str]:
    d0, d1 = _date.fromisoformat(start), _date.fromisoformat(end)
    out = []
    while d0 <= d1:
        out.append(d0.isoformat())
        d0 += timedelta(days=1)
    # newest-first, like the reference (fitbit_utils.py:211-212)
    return out[::-1]


class RestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.resources = [
            r for r in options.get("resources", DEFAULT_RESOURCES).split(",") if r
        ]
        self.dates = _date_seq(
            options.get("start", "2024-01-01"), options.get("end", "2024-01-07")
        )
        self.samples = int(options.get("samples_per_day", "24"))
        self.empty_dates = frozenset(
            d for d in options.get("empty_dates", "").split(",") if d
        )
        self.pushed: list[Filter] = []

    # -- pushdown: prune the work-item grid ---------------------------
    def _attr(self, f: Filter) -> str:
        return f.attribute[0] if isinstance(f.attribute, tuple) else str(f.attribute)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            name = self._attr(f)
            if name == "resource" and isinstance(f, (EqualTo, In)):
                vals = set(f.value) if isinstance(f, In) else {f.value}
                self.resources = [r for r in self.resources if r in vals]
                self.pushed.append(f)
            elif name == "date" and isinstance(f, In):
                vals = set(f.value)
                self.dates = [d for d in self.dates if d in vals]
                self.pushed.append(f)
            elif name == "date" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                ops = {
                    EqualTo: lambda d, v: d == v,
                    GreaterThan: lambda d, v: d > v,
                    GreaterThanOrEqual: lambda d, v: d >= v,
                    LessThan: lambda d, v: d < v,
                    LessThanOrEqual: lambda d, v: d <= v,
                }
                keep = ops[type(f)]
                self.dates = [d for d in self.dates if keep(d, f.value)]
                self.pushed.append(f)
            else:
                # unsupported → Spark applies it post-scan
                yield f

    def partitions(self) -> list[InputPartition]:
        return [WorkItem(r, d) for r in self.resources for d in self.dates]

    def read(self, part: WorkItem) -> Iterator[tuple]:
        src = FixtureSource(
            samples_per_day=self.samples, empty_dates=self.empty_dates
        )
        for row in src.fetch(part.resource, part.date):
            yield (part.resource, part.date, row["time"], row["value"])


class RestDataSource(DataSource):
    """``spark.read.format("fitness_rest")`` — register with
    ``spark.dataSource.register(RestDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "fitness_rest"

    def schema(self) -> str:
        return "resource string, date string, time string, value double"

    def reader(self, schema) -> RestReader:
        return RestReader(dict(self.options))


class RestStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming face of the REST source: continuous
    ingestion. The offset is the count of dates already ingested
    (oldest-first — a live deployment appends new dates as they arrive);
    each micro-batch drains every unconsumed date across all resources.

    ``readBetweenOffsets`` replays any [start, end) deterministically —
    with the fixture transport that is trivially exact, and with a real
    REST backend it is as exact as the API's own immutability, which is
    the contract checkpoint recovery needs for exactly-once.
    """

    def __init__(self, options: dict) -> None:
        self.resources = [
            r for r in options.get("resources", DEFAULT_RESOURCES).split(",") if r
        ]
        # oldest-first for a forward-moving stream
        self.dates = _date_seq(
            options.get("start", "2024-01-01"), options.get("end", "2024-01-07")
        )[::-1]
        self.samples = int(options.get("samples_per_day", "24"))
        self.empty_dates = frozenset(
            d for d in options.get("empty_dates", "").split(",") if d
        )

    def initialOffset(self) -> dict:
        return {"n_dates": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: the runtime pickles the batch rows
        # into the checkpoint prefetch cache for replay
        src = FixtureSource(
            samples_per_day=self.samples, empty_dates=self.empty_dates
        )
        return [
            (r, d, row["time"], row["value"])
            for d in self.dates[lo:hi]
            for r in self.resources
            for row in src.fetch(r, d)
        ]

    def read(self, start: dict):
        lo = start["n_dates"]
        hi = len(self.dates)
        # iter(list): the runtime requires an iterator object, and a
        # list_iterator stays picklable for the prefetch-replay cache
        return iter(self._rows(lo, hi)), {"n_dates": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["n_dates"], end["n_dates"]))


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("fitness_rest_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "fitness_rest_stream"

    def schema(self) -> str:
        return "resource string, date string, time string, value double"

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(dict(self.options))
