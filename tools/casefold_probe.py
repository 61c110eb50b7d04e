"""Case-fold version-skew tripwire: re-derive the casefold.py sets
EMPIRICALLY and fail if either engine's Unicode tables moved.

The pinned sets in functions/casefold.py are constants of THIS engine
pair (Spark's JDK Unicode tables vs DuckDB's utf8proc) — part of the
divergence is pure version skew, so a JDK or duckdb upgrade can
silently move the boundary. This tool replays the r11 derivation:

  1. every assigned codepoint (0x20..0x10FFFF minus surrogates)
     through upper()/lower() on both engines → the UPPER/LOWER
     divergent sets;
  2. every codepoint anchored as "a"+c+"b" through reverse() → the
     grapheme-joiner set (single-anchor part);
  3. asserts set(1) == the pinned UPPER/LOWER ranges exactly, and
     set(2) ⊆ the pinned REVERSE ranges (the pinned set additionally
     carries the pair-only joiners — CR, Hangul jamo, regional
     indicators — that no single anchor can expose).

Usage: python tools/casefold_probe.py       (exit 1 on drift)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _expand(ranges):
    out = set()
    for a, b in ranges:
        out.update(range(a, b + 1))
    return out


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cassandra_migrate_keyspace_from_cluster_spark.functions import casefold as cf
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

    spark = build_session(app_name="casefold_probe")
    spark.sparkContext.setLogLevel("ERROR")

    cps = [c for c in range(0x20, 0x110000) if not (0xD800 <= c <= 0xDFFF)]
    d = tempfile.mkdtemp(prefix="casefold_probe_")
    pq.write_table(
        pa.table({
            "cp": pa.array(cps, pa.int64()),
            "ch": pa.array([chr(c) for c in cps], pa.string()),
            "s": pa.array(["a" + chr(c) + "b" for c in cps], pa.string()),
        }),
        os.path.join(d, "chars.parquet"),
    )

    sdf = spark.read.parquet(d)
    sp = {
        r.cp: (r.u, r.l, r.r)
        for r in sdf.select(
            "cp", F.upper("ch").alias("u"), F.lower("ch").alias("l"),
            F.reverse("s").alias("r"),
        ).collect()
    }
    con = duckdb.connect()
    dk = {
        cp: (u, l, r)
        for cp, u, l, r in con.execute(
            "SELECT cp, upper(ch), lower(ch), reverse(s) FROM "
            f"read_parquet('{os.path.join(d, 'chars.parquet')}')"
        ).fetchall()
    }

    up = {c for c in sp if sp[c][0] != dk[c][0]}
    lo = {c for c in sp if sp[c][1] != dk[c][1]}
    rev = {c for c in sp if sp[c][2] != dk[c][2]}

    fails = []
    if up != _expand(cf.UPPER_DIVERGENT_RANGES):
        fails.append(
            f"UPPER drift: +{sorted(map(hex, up - _expand(cf.UPPER_DIVERGENT_RANGES)))[:10]} "
            f"-{sorted(map(hex, _expand(cf.UPPER_DIVERGENT_RANGES) - up))[:10]}"
        )
    if lo != _expand(cf.LOWER_DIVERGENT_RANGES):
        fails.append(
            f"LOWER drift: +{sorted(map(hex, lo - _expand(cf.LOWER_DIVERGENT_RANGES)))[:10]} "
            f"-{sorted(map(hex, _expand(cf.LOWER_DIVERGENT_RANGES) - lo))[:10]}"
        )
    extra_rev = rev - _expand(cf.REVERSE_JOINER_RANGES)
    if extra_rev:
        fails.append(f"REVERSE drift: +{sorted(map(hex, extra_rev))[:10]}")

    # the trim pin: DuckDB's bare trim must still differ from the
    # ASCII-space form on exactly the unicode-whitespace members —
    # i.e. trim(x, ' ') stays the correct oracle spelling
    n_trim = con.execute(
        "SELECT count(*) FROM read_parquet("
        f"'{os.path.join(d, 'chars.parquet')}') "
        "WHERE trim(ch) != trim(ch, ' ')"
    ).fetchone()[0]
    if n_trim == 0:
        fails.append("TRIM drift: DuckDB bare trim no longer strips "
                     "unicode whitespace — re-probe the trim law")

    print(f"casefold probe: upper={len(up)} lower={len(lo)} "
          f"rev_anchor={len(rev)} duck_unicode_trim={n_trim}")
    if fails:
        for f_ in fails:
            print("FAIL", f_)
        sys.exit(1)
    print("CASEFOLD PROBE: sets match the pinned constants")


if __name__ == "__main__":
    main()
