"""Case-fold version-skew tripwire: re-derive the casefold.py sets
EMPIRICALLY and fail if either engine's Unicode tables moved.

The pinned sets in functions/casefold.py are constants of THIS engine
pair (Spark's JDK Unicode tables vs DuckDB's utf8proc) — part of the
divergence is pure version skew, so a JDK or duckdb upgrade can
silently move the boundary. This tool replays the r11 derivation:

  1. every assigned codepoint (0x20..0x10FFFF minus surrogates)
     through upper()/lower() on both engines → the UPPER/LOWER
     context-free divergent sets;
  1b. (r12) the same codepoints CASED-ANCHORED — 'Α'+c (word-final
     position) and 'Α'+c+'β' (medial) — through upper()/lower() on
     both engines → the CONTEXT-SENSITIVE divergent members a
     single-codepoint sweep cannot see (Unicode conditional mappings:
     the JVM applies SpecialCasing.txt context rules, utf8proc maps
     context-free; U+03A3 Final_Sigma is the only member today);
  2. every codepoint anchored as "a"+c+"b" through reverse() → the
     grapheme-joiner set (single-anchor part);
  3. asserts set(1) ∪ set(1b) == the pinned UPPER/LOWER ranges
     exactly, and set(2) ⊆ the pinned REVERSE ranges (the pinned set
     additionally carries the pair-only joiners — CR, Hangul jamo,
     regional indicators — that no single anchor can expose).

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
            # cased-letter-anchored contexts (r12): word-FINAL ('Α'+c)
            # and MEDIAL ('Α'+c+'β') positions expose conditional
            # mappings (SpecialCasing.txt) the bare-codepoint sweep
            # cannot — Final_Sigma fires only after a cased letter
            # with no cased letter following.
            "fin": pa.array(["Α" + chr(c) for c in cps], pa.string()),
            "med": pa.array(["Α" + chr(c) + "β" for c in cps], pa.string()),
        }),
        os.path.join(d, "chars.parquet"),
    )

    sdf = spark.read.parquet(d)
    sp = {
        r.cp: (r.u, r.l, r.r, r.uf, r.lf, r.um, r.lm)
        for r in sdf.select(
            "cp", F.upper("ch").alias("u"), F.lower("ch").alias("l"),
            F.reverse("s").alias("r"),
            F.upper("fin").alias("uf"), F.lower("fin").alias("lf"),
            F.upper("med").alias("um"), F.lower("med").alias("lm"),
        ).collect()
    }
    con = duckdb.connect()
    dk = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            "SELECT cp, upper(ch), lower(ch), reverse(s), "
            "upper(fin), lower(fin), upper(med), lower(med) FROM "
            f"read_parquet('{os.path.join(d, 'chars.parquet')}')"
        ).fetchall()
    }

    # context-free divergence ∪ context-anchored divergence: a
    # codepoint is LOWER-divergent if the engines disagree on it bare,
    # word-final, or medial (same for UPPER).
    up = {c for c in sp
          if sp[c][0] != dk[c][0] or sp[c][3] != dk[c][3]
          or sp[c][5] != dk[c][5]}
    lo = {c for c in sp
          if sp[c][1] != dk[c][1] or sp[c][4] != dk[c][4]
          or sp[c][6] != dk[c][6]}
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
