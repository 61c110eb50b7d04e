"""Data-shift parity probe: every oracle-paired query must stay
CELL-EXACT vs its DuckDB twin when the DATA's shape shifts in ways the
fixtures never exercise — both engines read the SAME perturbed tables,
so this is parity under distribution shift, not invariance.

Why this exists (SURVEY.md §5.3 posture — probe off-gate axes the
per-round driver cannot see): every parity gate runs the same
generator's fixtures, whose shape is benign — no NULLs anywhere, all
ids unique, every table comfortably populated. Real 100-TB corpora
have none of those guarantees, and the engine-divergence classes that
benignity hides are exactly the ones that survive every gate:

  - NULL semantics: Spark and DuckDB differ by DEFAULT on null sort
    placement (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST) and on
    several scalar functions' null-in/null-out contracts — any query
    whose oracle twin silently leans on the shared no-NULL fixture
    diverges the day a null arrives;
  - duplicate rows: at-least-once delivery and replayed batches make
    exact duplicates routine; survivor picks, "unique"-id tie-breaks,
    and rank cuts must stay well-defined as multisets when uniqueness
    breaks (exact duplicates keep every deterministic query's OUTPUT
    multiset well-defined — identical rows are interchangeable);
  - tiny inputs: 1-2-row groups flip sample statistics (stddev_samp,
    corr) to NULL and put every percentile at a boundary — the
    head-slice mode holds both engines to the same answer there.

Perturbation modes (each writes a full perturbed fixture set with
pyarrow — logical types, incl. the NTZ timestamp encoding, preserved
byte-exact — then runs Spark AND DuckDB against it):

  dup2   every table concatenated with itself (every row exactly
         twice), multi-row-group layout so the copies interleave
         across splits;
  nulls  deterministic seeded NULL injection (p = 0.07) into non-key
         columns — ids/join keys/tie-breaks stay non-null (they are
         the declared total-order contract; nullable tie-breaks are a
         schema-design error, not an engine property), and events.ts
         stays non-null (event-time nullability is an ingress
         contract: watermark semantics are undefined on null event
         time, so production pipelines filter them at the source);
  head3  every table truncated to its first 3 rows (referentially
         ragged by construction — both engines see the same rags);
  textedge  seeded replacement of ~10% of each text-bearing column
         with TEXT_EDGE_SHAPES (empty/whitespace/unicode/huge-token/
         control-char/digit shapes — see TEXT_EDGE_COLS for the
         ingress-contract exclusions and §5.4 for the unicode laws
         this mode pinned).

Rows-only queries (seeded sketches — same set conf_invariance names)
only have to RUN without error: their values are engine-specific by
declaration and their semantic floors are the recall/containment
pytest laws.

Usage: python tools/data_shift.py [sf_dir] [mode ...]
       (defaults: /root/testdata/sf0.001, all modes)
       DS_ONLY=f2,f4 restricts to a comma-list of query-name prefixes
       (iteration aid; the shipped gate is the unfiltered run).
Prints one line per divergence and a final summary; exit 1 on FAIL.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# nulls mode: per-table columns eligible for NULL injection. Excluded
# by policy: *key/*id columns (join keys and the unique tie-breaks the
# determinism laws rely on), events.ts (ingress contract, see module
# docstring).
NULLABLE_COLS = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["embedding", "label"],
}

NULL_P = 0.07
SEED = 8

# textedge mode: per-table STRING columns that receive edge-shaped
# replacements. Excluded by policy: key/id columns (total-order
# contract), documents.lang (controlled vocabulary by ingress
# contract: normalized language codes), events.props (machine-written
# JSON by ingress contract — the engines' invalid-JSON contracts are
# irreconcilable: Spark get_json_object -> NULL, DuckDB json_extract
# -> error).
TEXT_EDGE_COLS = {
    "customer": ["c_name"],
    "part": ["p_name"],
    "orders": ["o_orderpriority"],
    "events": ["event_type"],
    "documents": ["text"],
}

# The shapes real corpora are full of and the benign generator never
# emits. Until r10 these deliberately stayed INSIDE the engines'
# case-mapping agreement set (Spark implements Unicode FULL case
# mapping, DuckDB SIMPLE 1:1 — probe-pinned) because the divergence
# was an engine property no oracle could absorb. The r11 CASE-FOLD
# LAW (functions/casefold.py: guarded case/reverse extractions,
# ASCII-space-pinned trim, total exact-fold for dedup hashes) closed
# that gap, so the divergent shapes now ride the gate like everything
# else — the old dodge is the new coverage.
TEXT_EDGE_SHAPES = [
    "",                                  # empty string
    "   ",                               # whitespace-only
    "x",                                 # single char
    "a  b",                              # double space -> empty token
    " lead trail ",                      # boundary whitespace
    "naïve café déjà vu",                # accented latin (1:1 case maps)
    "δθφ παντα ρει",                     # lowercase greek (no final-Σ)
    "中文文本没有空格的语料",             # CJK, no spaces at all
    "🚀 emoji 🌍 astral",                 # astral-plane codepoints
    "z" * 4096,                          # one huge token (>row-group page)
    "the the the the the",               # pure repetition
    "tab\tand\nnewline",                 # control whitespace inside
    "123 456",                           # digits-only (try_cast paths)
    "no delimiter here",                 # split_part miss
    # r11 case-fold-law shapes (previously dodged — see note above)
    "straße İstanbul ﬁle",          # full-vs-simple case + ligature
    " nbsp em-sp lead",        # unicode whitespace (trim law)
    "éclair à̖ combining",               # grapheme clusters (reverse law)
    "Σσς ΑΒΓ greek case",                # medial-sigma + uppercase greek
    # r12: TRAILING Σ after a cased letter — the position where the
    # JVM's contextual Final_Sigma rule actually fires ('ΟΔΟΣ'→'οδος'
    # vs utf8proc's context-free 'οδοσ'); Σ now rides the
    # LOWER-divergent class so both engines guard/unfold it alike.
    "ΟΔΟΣ ΤΗΣ ΕΛΛΑΔΟΣ",
]
TEXT_EDGE_P = 0.10


def perturb_textedge(sf_dir: str, out_dir: str) -> None:
    """Seeded deterministic replacement of ~10% of each text-bearing
    column with TEXT_EDGE_SHAPES (cycled in pick order, so every shape
    lands in every column at any table size >= ~1/P·len(shapes))."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        n = tbl.num_rows
        for ci, col in enumerate(TEXT_EDGE_COLS.get(name, [])):
            rng = np.random.default_rng(
                SEED + 7000 * ci + zlib.crc32(col.encode()) % 997
            )
            mask = rng.random(n) < TEXT_EDGE_P
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(idx)
            vals = tbl.column(idx).to_pylist()
            j = 0
            for r, m in enumerate(mask):
                if m:
                    vals[r] = TEXT_EDGE_SHAPES[j % len(TEXT_EDGE_SHAPES)]
                    j += 1
            tbl = tbl.set_column(idx, field, pa.array(vals, type=field.type))
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


def _write(tbl, path: str) -> None:
    import pyarrow.parquet as pq

    pq.write_table(
        tbl, path, row_group_size=max(1, (tbl.num_rows + 2) // 3)
    )


def perturb_dup2(sf_dir: str, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        _write(
            pa.concat_tables([tbl, tbl]),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def perturb_head3(sf_dir: str, out_dir: str) -> None:
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        _write(tbl.slice(0, 3), os.path.join(out_dir, f"{name}.parquet"))


def perturb_nulls(sf_dir: str, out_dir: str) -> None:
    """Seeded deterministic NULL mask per (table, column): the same
    rows go null on every run, so findings reproduce exactly. (The seed
    folds a crc32 of the table name — never Python's ``hash()``, which
    is salted per process and would make findings unreproducible.)"""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        n = tbl.num_rows
        for ci, col in enumerate(NULLABLE_COLS.get(name, [])):
            rng = np.random.default_rng(
                SEED + 1000 * ci + zlib.crc32(name.encode()) % 997
            )
            mask = rng.random(n) < NULL_P
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(idx)
            vals = tbl.column(idx).to_pylist()
            vals = [None if m else v for v, m in zip(vals, mask)]
            tbl = tbl.set_column(
                idx, field, pa.array(vals, type=field.type)
            )
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


# skewkey mode: (table, skew key, unique id to re-mint, replication
# factor). The hot key's rows are replicated K× with FRESH ids so the
# id-uniqueness/total-order contracts hold while ONE key becomes a
# heavy hitter — the shape salting/AQE exist for, and the shape that
# stresses deterministic tie-breaks (31 identical embeddings → a
# 31-way cos_sim tie at every top-k cut; a 31-clone document → one
# giant dedup/CC cluster; one user with 100× duplicate-ts events).
SKEW_SPECS = [
    ("orders", "o_custkey", "o_orderkey", 40),
    ("lineitem", "l_orderkey", "l_linenumber", 60),
    ("events", "user_id", "event_id", 100),
    ("documents", "doc_id", "doc_id", 30),
    ("embeddings", "vec_id", "vec_id", 30),
]


def perturb_skewkey(sf_dir: str, out_dir: str) -> None:
    """Replicate the hottest key's rows K× with freshly minted unique
    ids (hot key = max count, then min key — deterministic). For
    documents/embeddings the 'key' IS the id: one row is cloned into
    K new ids, making an exact-duplicate content cluster."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    specs = {t: (k, i, f) for t, k, i, f in SKEW_SPECS}
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        tbl = pq.read_table(src)
        if name not in specs:
            _write(tbl, os.path.join(out_dir, f"{name}.parquet"))
            continue
        key_col, id_col, k = specs[name]
        pdf = tbl.to_pandas()
        counts = pdf[key_col].value_counts()
        top = counts[counts == counts.max()].index.min()
        hot = pdf[pdf[key_col] == top]
        clones = pa.concat_tables([pa.Table.from_pandas(hot, schema=tbl.schema)] * k)
        cdf = clones.to_pandas()
        # fresh ids: sequential past the current max (stays unique and
        # keeps the id's total-order contract; for documents/embeddings
        # this also RE-KEYS the clones so content, not id, collides)
        import numpy as np

        cdf[id_col] = np.arange(len(cdf), dtype="int64") + int(pdf[id_col].max()) + 1
        out = pa.concat_tables(
            [tbl, pa.Table.from_pandas(cdf, schema=tbl.schema)]
        )
        _write(out, os.path.join(out_dir, f"{name}.parquet"))


# tsedge mode: timestamp edge shapes into the event-time and date
# columns. Real corpora carry clock glitches — epoch-zero defaults
# (unset clocks), pre-1970 instants (negative epoch, where
# truncate-toward-zero and floor DISAGREE), deep-past dates (proleptic
# Gregorian territory), far-future (corrupted clocks, 9999-sentinels),
# and exact boundary instants (midnight, :59:59.999999) that sit ON
# every bucket/window edge. Benign fixtures never leave a narrow
# recent band, so bucket alignment, epoch conversion, interval frames
# and date arithmetic are all probed at one friendly sign and scale.
# Excluded by ingress contract: ts NULLability (watermark semantics,
# see the nulls mode) and ts uniqueness contracts (event_id tie-breaks
# stay intact — shapes replace the VALUE, never the key structure).
# Shape range bound: the comparison HARNESS (ours and the grading
# driver's alike) round-trips results through pandas datetime64[ns],
# whose domain is 1677-09-21..2262-04-11 — a year-1500 or 9999 output
# crashes Arrow's us->ns cast before any engine comparison happens
# (first-run finding). Both ENGINES handle the full us range fine; the
# probe stays inside the ns window because that is the harness's
# representable universe, and the interesting physics (negative epoch,
# floor-vs-truncate, proleptic dates, boundary instants) all fits.
TS_EDGE_SHAPES = [  # (y, m, d, h, mi, s, us)
    (1970, 1, 1, 0, 0, 0, 0),              # exact epoch zero
    (1969, 12, 31, 23, 59, 59, 123456),    # negative epoch, fractional
    (1969, 12, 31, 23, 59, 59, 500000),    # negative epoch, half-second
    (1900, 6, 15, 12, 34, 56, 789012),     # deep past, fractional
    (1800, 2, 28, 23, 59, 59, 999999),     # pre-1900 boundary-1us
    (2199, 12, 31, 23, 59, 59, 999999),    # far future, boundary-1us
    (2262, 1, 1, 0, 0, 0, 1),              # near the ns-harness ceiling
    (2024, 6, 30, 23, 59, 59, 999999),     # 1us before midnight
    (2024, 7, 1, 0, 0, 0, 0),              # exact midnight
    (1969, 7, 20, 20, 17, 40, 1),          # pre-1970, 1us past a second
]
TS_EDGE_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}
TS_EDGE_P = 0.08


def perturb_tsedge(sf_dir: str, out_dir: str) -> None:
    """Seeded deterministic replacement of ~8% of each time-bearing
    column with TS_EDGE_SHAPES (cycled in pick order), preserving the
    column's physical parquet encoding via pyarrow casts."""
    import datetime as dt
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    shapes = [dt.datetime(*s) for s in TS_EDGE_SHAPES]
    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        n = tbl.num_rows
        for ci, col in enumerate(TS_EDGE_COLS.get(name, [])):
            rng = np.random.default_rng(
                SEED + 3000 * ci + zlib.crc32(name.encode()) % 997
            )
            mask = rng.random(n) < TS_EDGE_P
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(idx)
            vals = tbl.column(idx).to_pylist()
            j = 0
            for r, m in enumerate(mask):
                if m:
                    vals[r] = shapes[j % len(shapes)]
                    j += 1
            tbl = tbl.set_column(idx, field, pa.array(vals, type=field.type))
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


# lakemix mode: the SAME logical data re-encoded with a per-table mix
# of parquet writer profiles — compression codecs (zstd/gzip/lz4/
# snappy/none), v2 data pages, dictionary off, DELTA_BINARY_PACKED /
# DELTA_LENGTH_BYTE_ARRAY column encodings, BYTE_STREAM_SPLIT floats,
# and tiny row groups. A 100-TB lake is written by MANY writers over
# years (Spark jobs, Flink sinks, pyarrow backfills, vendor exports);
# every gate so far read one generator's uniform encoding, so the two
# engines' parquet READER paths (Spark vectorized/parquet-mr decode
# vs DuckDB's native reader) were only ever probed at one point of
# the encoding matrix. Logical values are byte-identical by
# construction — any divergence is a reader bug, the class that
# corrupts silently at scale. (Data-side complement of
# conf_invariance's parquet_rowwise axis, which flips the SPARK
# reader on the same file.)
# Matrix bound, first-run finding: BYTE_STREAM_SPLIT is readable by
# DuckDB and by Spark's parquet-mr (row-wise) reader but NOT by
# Spark's VECTORIZED reader ("Unsupported encoding: BYTE_STREAM_SPLIT",
# Spark 4.1) — a real ingestion caveat documented in SCALE.md (BSS
# inputs need enableVectorizedReader=false or a rewrite), excluded
# here because the probe's contract is the both-readable matrix.
LAKEMIX_PROFILES = {
    "region": dict(compression="none"),
    "nation": dict(version="2.6", data_page_version="2.0",
                   compression="zstd"),
    "customer": dict(use_dictionary=False, compression="snappy"),
    "supplier": dict(version="2.6", use_dictionary=False,
                     column_encoding={"s_suppkey": "DELTA_BINARY_PACKED",
                                      "s_nationkey": "DELTA_BINARY_PACKED"}),
    "part": dict(compression="gzip", row_group_size=11),
    "orders": dict(version="2.6", data_page_version="2.0",
                   compression="zstd", use_dictionary=False,
                   column_encoding={"o_orderkey": "DELTA_BINARY_PACKED",
                                    "o_custkey": "DELTA_BINARY_PACKED"}),
    "lineitem": dict(version="2.6", data_page_version="2.0",
                     compression="lz4", row_group_size=997),
    "events": dict(use_dictionary=False, compression="zstd",
                   row_group_size=499),
    "documents": dict(version="2.6", use_dictionary=False,
                      column_encoding={
                          "text": "DELTA_LENGTH_BYTE_ARRAY",
                          "doc_id": "DELTA_BINARY_PACKED"}),
    "embeddings": dict(use_dictionary=False, compression="lz4"),
}


def perturb_lakemix(sf_dir: str, out_dir: str) -> None:
    """Rewrite every table bit-identical in VALUES under a different
    parquet writer profile (LAKEMIX_PROFILES)."""
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        pq.write_table(
            tbl, os.path.join(out_dir, f"{name}.parquet"),
            **LAKEMIX_PROFILES[name],
        )



# multifile mode: every table becomes a DIRECTORY of part files with a
# DIFFERENT writer profile per part — the true physical shape of a
# lake table (many writers over time, heterogeneous encodings INSIDE
# one table). Every other gate reads single-file tables, so the
# engines' multi-file scan paths (file listing order, file-boundary
# task splits, per-file footer handling, schema unification) and the
# engine's own directory-aware source plumbing (load_table's footer
# sniff, the cluster source's per-part walk, the commitlog source's
# segment concatenation) were never exercised. Values are
# byte-identical by construction. Standalone like head3 (the mode
# changes the PHYSICAL layout, so it does not compose as a storm
# stage — stages read each other's single-file outputs).
MULTIFILE_PART_PROFILES = [
    dict(version="2.6", data_page_version="2.0", compression="zstd"),
    dict(use_dictionary=False, compression="snappy"),
    dict(compression="gzip", row_group_size=7),
    dict(compression="none"),
]


def perturb_multifile(sf_dir: str, out_dir: str) -> None:
    """Split every table into 4 contiguous part files (sorted part
    names preserve global row order), each with its own writer
    profile, under a directory named <table>.parquet."""
    import pyarrow.parquet as pq

    k = len(MULTIFILE_PART_PROFILES)
    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        d = os.path.join(out_dir, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        n = tbl.num_rows
        bounds = [round(i * n / k) for i in range(k + 1)]
        wrote = 0
        for i in range(k):
            part = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
            if part.num_rows == 0 and wrote:
                continue  # tiny table: keep at least one file, skip empties
            pq.write_table(
                part, os.path.join(d, f"part-{i:02d}.parquet"),
                **MULTIFILE_PART_PROFILES[i],
            )
            wrote += 1


# orphan mode: referential holes at realistic volume. The benign
# fixtures are referentially PERFECT (every FK lands), and head3's
# raggedness is 3-row-tiny — but real migrations see dangling
# references routinely: partial copies, deleted parents, out-of-order
# table loads, retention windows that age out one side first. The mode
# drops a seeded deterministic ~10% of each PARENT/ENTITY table's rows
# while leaving every referencing table untouched: orders pointing at
# vanished customers, lineitems at vanished orders/parts/suppliers,
# documents whose embedding vanished and vice versa. Both engines read
# the same holed tables, so inner joins shrink identically and the
# interesting physics is everything that ASSUMED a partner exists:
# outer-join NULL extension through aggregation, scalar subqueries,
# as-of partners, referential-audit queries (a18's whole purpose),
# enrichment lookups. Child tables and the events stream (no parent
# table) keep full volume.
ORPHAN_DROP = {  # table -> (key column used for the seeded drop)
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "orders": "o_orderkey",        # orphans lineitem AND loses custs' orders
    "embeddings": "vec_id",        # documents lose their vectors
    "documents": "doc_id",         # vectors lose their documents
}
ORPHAN_P = 0.10


def perturb_orphan(sf_dir: str, out_dir: str) -> None:
    """Seeded deterministic drop of ~10% of each parent/entity table."""
    import zlib

    import numpy as np
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        key = ORPHAN_DROP.get(name)
        if key is not None and tbl.num_rows > 0:
            rng = np.random.default_rng(
                SEED + 7000 + zlib.crc32(name.encode()) % 997
            )
            keep = rng.random(tbl.num_rows) >= ORPHAN_P
            tbl = tbl.filter(keep)
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


# idspace mode: the benign generator mints every id as a SMALL dense
# positive integer (1..n), so every gate runs joins, top-k tie-breaks,
# hash partitioning, and id arithmetic at one friendly corner of the
# int64 domain. Real corpora don't: snowflake/UUID-derived ids exceed
# 2^32 routinely, and signed-hash id schemes go negative. The remap
# new_id = (id - 5) * 3_000_000_029 is order-preserving (a positive
# multiplier: every id-ASC tie-break law keeps the same winners),
# injective, applied to EVERY column of an id family at once (all FK
# joins keep matching), pushes every id of consequence past 2^32, and
# makes ids 1..4 of each family NEGATIVE. Both engines read the same
# remapped tables, so this is parity under id-space shift — it probes
# exactly the class the similarity kernels' old raw-id bit-packing
# (key = sim_int * 2^32 + id) would have failed. Excluded by schema
# contract: the int32 dimension keys (r_regionkey, n_nationkey,
# c_nationkey, s_nationkey, n_regionkey — a 25-row dimension's key
# never leaves int32 territory) and intra-order line numbers.
ID_MULT = 3_000_000_029
ID_SHIFT = 5
ID_FAMILIES = {  # family -> [(table, column), ...] remapped together
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}


def perturb_idspace(sf_dir: str, out_dir: str) -> None:
    """Order-preserving affine remap of every int64 id family into
    huge-magnitude (and partly negative) id space."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    remap_cols = {}
    for cols in ID_FAMILIES.values():
        for tbl_name, col in cols:
            remap_cols.setdefault(tbl_name, []).append(col)
    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        for col in remap_cols.get(name, []):
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(idx)
            assert field.type == pa.int64(), (name, col, field.type)
            shifted = pc.multiply_checked(
                pc.subtract_checked(tbl.column(idx), pa.scalar(ID_SHIFT)),
                pa.scalar(ID_MULT),
            )
            tbl = tbl.set_column(idx, field, shifted)
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


# extremes mode: IEEE-754 edge values into the two columns whose
# DECLARED domain is "arbitrary double": events.value (sensor/metric
# payload — upstream glitches deliver NaN/Inf/huge/denormal routinely)
# and embeddings.embedding (model outputs — fp16/fp32 training
# overflow produces Inf/NaN elements, dead dims produce zero vectors).
# Excluded by policy: every money/quantity column (l_extendedprice,
# o_totalprice, acctbals, l_quantity… are DECLARED 2dp-multiple
# domains — the exact-cents laws are built on that contract, so an
# Inf price is a schema violation, not a distribution shift).
#
# Value-shape choices are deliberate about FLOAT-SUM ORDER SAFETY:
# both engines sum doubles in engine-chosen order, and that noise is
# an accepted non-goal (functions/rounding scope note) — so the huge
# magnitude is a POSITIVE power of two (2^100) only. A group holding
# one or more 2^100s absorbs every moderate addend identically in any
# order (sum is exactly k·2^100); mixed-sign huge values would make
# catastrophic cancellation order-visible, turning the probe into a
# float-associativity test both engines legitimately fail. NaN/±Inf
# co-occurrence is order-safe (NaN ∪ anything → NaN; +Inf + -Inf →
# NaN in both engines).
EXTREME_VALUES = [
    float("nan"),            # NaN: ordering (both engines: > +Inf),
                             # equality-in-grouping, aggregate poison
    float("inf"),            # +Inf
    float("-inf"),           # -Inf (with +Inf in one group -> NaN sum)
    -0.0,                    # signed zero (groups/sorts as 0.0)
    2.0 ** 100,              # huge, order-safe absorber (see above)
    5e-324,                  # smallest positive double denormal
    -5e-324,                 # negative denormal (underflow-to-zero paths)
    2.0 ** -1030,            # deep denormal-adjacent magnitude
]
EXTREME_P = 0.08

# Per-vector embedding shapes (applied to whole vectors, cycled).
# float32 domain: denormal floor ~1.4e-45, max ~3.4e38 — 1e25 is
# representable but its SQUARE overflows fp32 (norm pipelines that
# stay in fp32 produce Inf; fp64 pipelines don't — an engine-parity
# axis), and 1e-40 is an fp32 denormal.
def _emb_nan1(v):      # one poisoned element
    v[0] = float("nan"); return v
def _emb_posinf(v):
    v[len(v) // 2] = float("inf"); return v
def _emb_neginf(v):
    v[-1] = float("-inf"); return v
def _emb_zero(v):      # dead vector: cosine -> 0/0
    return [0.0] * len(v)
def _emb_huge(v):      # fp32-representable, square overflows fp32
    return [x * 1e25 for x in v]
def _emb_tiny(v):      # fp32 denormal range
    return [x * 1e-40 for x in v]
def _emb_negzero(v):
    return [-0.0 if x == 0.0 else x for x in v]

EXTREME_EMB_SHAPES = [_emb_nan1, _emb_posinf, _emb_neginf, _emb_zero,
                      _emb_huge, _emb_tiny, _emb_negzero]
EXTREME_EMB_P = 0.06


def perturb_extremes(sf_dir: str, out_dir: str) -> None:
    """Seeded deterministic injection of EXTREME_VALUES into ~8% of
    ``events.value`` and EXTREME_EMB_SHAPES into ~6% of embedding
    vectors (cycled in pick order). All other tables copy through."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        n = tbl.num_rows
        if name == "events":
            rng = np.random.default_rng(SEED + zlib.crc32(b"ext_value") % 997)
            mask = rng.random(n) < EXTREME_P
            idx = tbl.schema.get_field_index("value")
            field = tbl.schema.field(idx)
            vals = tbl.column(idx).to_pylist()
            j = 0
            for r, m in enumerate(mask):
                if m:
                    vals[r] = EXTREME_VALUES[j % len(EXTREME_VALUES)]
                    j += 1
            tbl = tbl.set_column(idx, field, pa.array(vals, type=field.type))
        elif name == "embeddings":
            rng = np.random.default_rng(SEED + zlib.crc32(b"ext_emb") % 997)
            mask = rng.random(n) < EXTREME_EMB_P
            idx = tbl.schema.get_field_index("embedding")
            field = tbl.schema.field(idx)
            vecs = tbl.column(idx).to_pylist()
            j = 0
            for r, m in enumerate(mask):
                if m and vecs[r] is not None:
                    vecs[r] = EXTREME_EMB_SHAPES[j % len(EXTREME_EMB_SHAPES)](
                        list(vecs[r])
                    )
                    j += 1
            tbl = tbl.set_column(idx, field, pa.array(vecs, type=field.type))
        _write(tbl, os.path.join(out_dir, f"{name}.parquet"))


def perturb_storm(sf_dir: str, out_dir: str) -> None:
    """Composition of the non-truncating modes, in ingress order:
    idspace (source ids are snowflake-scale to begin with) → orphan
    (parents are already missing at the source) → skewkey (hot keys
    exist in the source) → tsedge (their clocks glitch) → textedge
    (their payloads are arbitrary text) → extremes (their
    measurements glitch) → nulls (fields go missing) → dup2 (the
    whole batch is delivered at least once). A real 100-TB corpus has
    all eight simultaneously; this catches LAW INTERACTIONS the
    individual modes cannot (e.g. a null guard that assumes the
    textedge path already normalized, a replay collapse that meets a
    NULL key, a domain gate meeting a duplicated NaN, a window frame
    anchored on a duplicated negative-epoch instant, a skew-minted id
    colliding with a remapped key range, an outer-join NULL extension
    meeting an injected NULL), and the result ships in lakemix's mixed
    parquet encodings (the physical form whatever data exists arrives
    in — DELTA-packed huge negative ids, zstd'd unicode edge text).
    head3 stays standalone — truncation would erase the other
    shifts."""
    stages = [perturb_idspace, perturb_orphan, perturb_skewkey,
              perturb_tsedge, perturb_textedge, perturb_extremes,
              perturb_nulls, perturb_dup2, perturb_lakemix]
    cur = sf_dir
    tmps = []
    try:
        for fn in stages[:-1]:
            nxt = tempfile.mkdtemp(prefix="data_shift_storm_stage_")
            tmps.append(nxt)
            fn(cur, nxt)
            cur = nxt
        stages[-1](cur, out_dir)
    finally:
        for d in tmps:
            shutil.rmtree(d, ignore_errors=True)


MODES = {
    "dup2": perturb_dup2,
    "nulls": perturb_nulls,
    "head3": perturb_head3,
    "textedge": perturb_textedge,
    "skewkey": perturb_skewkey,
    "extremes": perturb_extremes,
    "tsedge": perturb_tsedge,
    "idspace": perturb_idspace,
    "orphan": perturb_orphan,
    "lakemix": perturb_lakemix,
    "multifile": perturb_multifile,
    "storm": perturb_storm,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wanted = sys.argv[2:] or list(MODES)
    unknown = [w for w in wanted if w not in MODES]
    if unknown:
        sys.exit(f"unknown mode(s): {unknown}; have {list(MODES)}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
    from tests.parity import compare_frames

    spark = build_session(app_name="data_shift")
    spark.sparkContext.setLogLevel("ERROR")
    all_specs = specs()
    only = [p for p in os.environ.get("DS_ONLY", "").split(",") if p]
    if only:
        all_specs = {
            n: s for n, s in all_specs.items()
            if any(n.startswith(p) for p in only)
        }

    t_all = time.time()
    fails: list[str] = []
    for mode in wanted:
        out_dir = tempfile.mkdtemp(prefix=f"data_shift_{mode}_")
        try:
            MODES[mode](sf_dir, out_dir)
            con = duckdb.connect()
            for name in TABLES:
                tp = f"{out_dir}/{name}.parquet"
                # a directory-shaped table (multifile mode) globs its
                # sorted part files
                src_sql = f"{tp}/*.parquet" if os.path.isdir(tp) else tp
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{src_sql}')"
                )
            t_m = time.time()
            n_ok = 0
            for name, spec in all_specs.items():
                try:
                    spark_pdf = spec.fn(spark, out_dir).toPandas()
                    if spec.oracle is None:
                        n_ok += 1  # rows-only: graceful run is the bar
                        continue
                    duck_pdf = con.execute(spec.oracle).df()
                    compare_frames(spark_pdf, duck_pdf, f"{mode}/{name}")
                    n_ok += 1
                except AssertionError as diff:
                    fails.append(f"{mode}/{name}")
                    print(f"FAIL {mode}/{name}: "
                          f"{str(diff).splitlines()[0][:220]}", flush=True)
                except ValueError as ex:
                    # b15b's guarded_merge_asof raising past its
                    # documented pair-space bound IS the declared
                    # at-scale behavior (r12, operators/asof.py) —
                    # the same contract under which scale_sweep skips
                    # b15b at sf0.1. Any other ValueError is a fail.
                    if "merge_asof pair space" in str(ex):
                        n_ok += 1
                        print(f"SKIP {mode}/{name}: declared pair-space "
                              f"guard fired ({str(ex)[:90]}...)", flush=True)
                    else:
                        fails.append(f"{mode}/{name}")
                        print(f"FAIL {mode}/{name}: ValueError: "
                              f"{str(ex)[:200]}", flush=True)
                except Exception as ex:  # noqa: BLE001
                    fails.append(f"{mode}/{name}")
                    print(f"FAIL {mode}/{name}: {type(ex).__name__}: "
                          f"{str(ex)[:200]}", flush=True)
            con.close()
            print(f"{mode}: {n_ok}/{len(all_specs)} parity-exact "
                  f"({time.time() - t_m:.0f}s)", flush=True)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    print(
        f"DATA-SHIFT RESULT: modes={wanted} fails={fails or 'none'} "
        f"({time.time() - t_all:.0f}s)"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
