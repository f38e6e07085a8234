"""Interval join: bucketized equi-join must equal the brute-force
inequality join on every edge the bucket arithmetic could get wrong."""

from __future__ import annotations

import datetime as dt

import pytest

from parallel_count_min_sketch_spark.operators.interval_join import interval_join

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)
H = 3_600_000_000  # 1h in µs


def _ts(sec: float) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


def _brute(left_rows, right_rows, w_us):
    out = set()
    for lid, lk, lts in left_rows:
        for rid, rk, rts in right_rows:
            if lk is None or rk is None or lts is None or rts is None:
                continue
            if lk == rk and abs((rts - lts).total_seconds() * 1e6) <= w_us:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("bucket_us", [H, H // 3, 7 * H])
def test_interval_join_equals_brute_force(spark, bucket_us):
    """Window edges exactly inclusive, matches that straddle bucket
    boundaries, NULL keys/timestamps, and bucket widths smaller than,
    equal to, and wider than the window."""
    left = [
        (1, 10, _ts(0)),
        (2, 10, _ts(7200)),        # 2h later
        (3, 20, _ts(100)),
        (4, 10, None),             # NULL ts: never matches
        (5, None, _ts(0)),         # NULL key: never matches
    ]
    right = [
        (101, 10, _ts(3600)),      # exactly +1h from left 1: inclusive
        (102, 10, _ts(3600.000001)),  # 1µs past the window of left 1
        (103, 10, _ts(-3600)),     # exactly -1h from left 1
        (104, 10, _ts(10799.999999)),  # just inside +1h of left 2
        (105, 20, _ts(99)),
        (106, 20, _ts(-3501)),     # just outside -1h of left 3
        (107, 10, None),
        (108, None, _ts(0)),
    ]
    ldf = spark.createDataFrame(left, "lid BIGINT, k BIGINT, lts TIMESTAMP")
    rdf = spark.createDataFrame(right, "rid BIGINT, k BIGINT, rts TIMESTAMP")
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(ldf, rdf, "k", "lts", "rts",
                               window_us=H, bucket_us=bucket_us).collect()
    }
    assert got == _brute(left, right, H)
    assert (1, 101) in got and (1, 103) in got  # inclusive both ends
    assert (1, 102) not in got                  # 1µs outside


def test_interval_join_no_duplicate_pairs(spark):
    """The right side lands in exactly one bucket, so a pair can only be
    produced once no matter how many buckets the left row explodes to."""
    ldf = spark.createDataFrame([(1, 5, _ts(0))],
                                "lid BIGINT, k BIGINT, lts TIMESTAMP")
    rdf = spark.createDataFrame([(9, 5, _ts(1))],
                                "rid BIGINT, k BIGINT, rts TIMESTAMP")
    out = interval_join(ldf, rdf, "k", "lts", "rts",
                        window_us=10 * H, bucket_us=H // 4).collect()
    assert len(out) == 1


def test_interval_join_validates_params(spark):
    ldf = spark.createDataFrame([(1, 5, _ts(0))],
                                "lid BIGINT, k BIGINT, lts TIMESTAMP")
    with pytest.raises(ValueError, match="window_us"):
        interval_join(ldf, ldf, "k", "lts", "lts", window_us=-1)
    with pytest.raises(ValueError, match="bucket_us"):
        interval_join(ldf, ldf, "k", "lts", "lts", window_us=H, bucket_us=0)
