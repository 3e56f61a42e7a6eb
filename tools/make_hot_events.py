"""Derive a skew-witness events table from an existing scaled tier:
read <src>/events.parquet, reassign a deterministic fraction of rows
to ONE hot user (make_scaled_testdata._inject_hot_user), write
<dst>/events.parquet. Cheaper than regenerating a full tier when only
the skew gates need the hot shape.

Usage: python tools/make_hot_events.py --src /tmp/levi_sf10
           --dst /tmp/levi_sf10_hot --hot-frac 0.33
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_scaled_testdata import _inject_hot_user  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/levi_sf10")
    ap.add_argument("--dst", default="/tmp/levi_sf10_hot")
    ap.add_argument("--hot-frac", type=float, default=0.33)
    a = ap.parse_args()
    os.makedirs(a.dst, exist_ok=True)
    t = pq.read_table(os.path.join(a.src, "events.parquet"))
    out = _inject_hot_user(t, a.hot_frac)
    pq.write_table(out, os.path.join(a.dst, "events.parquet"),
                   compression="snappy")
    print(f"wrote {a.dst}/events.parquet ({len(out)} rows)")


if __name__ == "__main__":
    main()
