"""Date-string partition arithmetic.

Reproduces the semantics of the reference's PartitionRange/PartitionSpec
(api/src/main/scala/ai/chronon/api/PartitionRange.scala, PartitionSpec.scala;
defaults ds/yyyy-MM-dd/1d per spark/.../catalog/TableUtils.scala:48-52) as a
small pure-Python value type the planner uses for scan-range math, step
chunking and hole detection. No Spark dependency — everything here runs on
the driver before any job is launched.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Iterator, Optional

FMT = "%Y-%m-%d"


def parse_ds(ds: str) -> dt.date:
    return dt.datetime.strptime(ds, FMT).date()


def format_ds(d: dt.date) -> str:
    return d.strftime(FMT)


def shift_ds(ds: str, days: int) -> str:
    return format_ds(parse_ds(ds) + dt.timedelta(days=days))


@dataclass(frozen=True)
class PartitionRange:
    """Inclusive [start, end] range of daily ds partitions."""

    start: str
    end: str

    def __post_init__(self):
        assert parse_ds(self.start) <= parse_ds(self.end), (self.start, self.end)

    @property
    def days(self) -> int:
        return (parse_ds(self.end) - parse_ds(self.start)).days + 1

    def partitions(self) -> Iterator[str]:
        d = parse_ds(self.start)
        while d <= parse_ds(self.end):
            yield format_ds(d)
            d += dt.timedelta(days=1)

    def ts_range(self) -> tuple:
        """(min_ts, max_ts) inclusive epoch millis covered by this range:
        [start 00:00:00.000 UTC, end+1d 00:00:00.000 UTC - 1ms]."""
        epoch = dt.date(1970, 1, 1)
        day_ms = 86_400_000
        min_ts = (parse_ds(self.start) - epoch).days * day_ms
        max_ts = ((parse_ds(self.end) - epoch).days + 1) * day_ms - 1
        return (min_ts, max_ts)

    def shift(self, days: int) -> "PartitionRange":
        return PartitionRange(shift_ds(self.start, days), shift_ds(self.end, days))

    def intersect(self, other: "PartitionRange") -> Optional["PartitionRange"]:
        s = max(self.start, other.start)
        e = min(self.end, other.end)
        return PartitionRange(s, e) if s <= e else None

    def steps(self, step_days: int) -> list["PartitionRange"]:
        """Chunk into consecutive sub-ranges of at most ``step_days`` days
        (the reference's step-day chunking, JoinBase.scala:344-365 — bounds
        shuffle size per job at scale)."""
        assert step_days >= 1
        out = []
        s = parse_ds(self.start)
        endd = parse_ds(self.end)
        while s <= endd:
            e = min(s + dt.timedelta(days=step_days - 1), endd)
            out.append(PartitionRange(format_ds(s), format_ds(e)))
            s = e + dt.timedelta(days=1)
        return out


def missing_ranges(requested: PartitionRange, existing: set) -> list[PartitionRange]:
    """Contiguous runs of requested partitions not present in ``existing``.

    The reference's unfilledRanges (spark/.../catalog/TableUtils.scala:347-431)
    — this IS the checkpoint/resume mechanism: a re-run recomputes exactly
    the holes.
    """
    holes: list[PartitionRange] = []
    run_start: Optional[str] = None
    prev: Optional[str] = None
    for ds in requested.partitions():
        if ds in existing:
            if run_start is not None:
                holes.append(PartitionRange(run_start, prev))
                run_start = None
        else:
            if run_start is None:
                run_start = ds
        prev = ds
    if run_start is not None:
        holes.append(PartitionRange(run_start, prev))
    return holes


def range_to_fill(
    end_partition: str,
    query_start: Optional[str] = None,
    query_end: Optional[str] = None,
    first_available: Optional[str] = None,
    override_start: Optional[str] = None,
    historical_backfill: bool = True,
) -> PartitionRange:
    """The join backfill's fill range — reference
    JoinUtils.getRangeToFill (JoinUtils.scala:113-147):

    start = override_start, else the left query's start_partition, else
    the left table's first available partition (required); with
    ``historical_backfill=False`` the override is forced to the end
    partition so ONLY the latest partition fills (reference
    NoHistoricalBackfillTest.scala:64-79). end = the left query's
    end_partition, else the requested end."""
    if not historical_backfill:
        override_start = end_partition
    start = override_start or query_start or first_available
    if start is None:
        raise ValueError(
            "no fill start: give override_start, the query's "
            "start_partition, or the left table's first available partition"
        )
    end = query_end or end_partition
    return PartitionRange(start, end)
