"""Migration-surface unit tests (SURVEY.md §5.3.6 round-trip, plus the
Cassandra-path design helpers that are string/config-only here)."""

from __future__ import annotations

import tempfile

from cassandra_migrate_keyspace_from_cluster_spark.operators import migrate as mig
from cassandra_migrate_keyspace_from_cluster_spark.sources import cassandra as cass
from cassandra_migrate_keyspace_from_cluster_spark.sources import load_table

from .conftest import SF_SMOKE as SMOKE_SF


def test_copy_roundtrip_schema_and_checksum(spark):
    src = load_table(spark, SMOKE_SF, "nation")
    dst_dir = tempfile.mkdtemp(prefix="mig_rt_")
    copied = mig.copy_table(spark, SMOKE_SF, dst_dir, "nation")
    assert copied.schema == src.schema
    a = mig.content_checksum(src, "nation").collect()
    b = mig.content_checksum(copied, "nation").collect()
    assert a == b


def test_range_split_covers_all_rows(spark):
    orders = load_table(spark, SMOKE_SF, "orders")
    buckets = mig.range_split_counts(orders, "o_orderkey", 8).collect()
    assert len(buckets) == 8
    assert sum(r.n_rows for r in buckets) == orders.count()
    # contiguous, non-overlapping key ranges in bucket order
    rows = sorted(buckets, key=lambda r: r.bucket)
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_key < cur.min_key


def test_resumable_copy_skips_completed_ranges(spark):
    """A9: an interrupted copy resumes where it stopped — completed
    ranges are skipped (markers untouched) and the final content equals
    the source."""
    import os

    import pytest

    src = load_table(spark, SMOKE_SF, "orders")
    dst = tempfile.mkdtemp(prefix="mig_resume_")
    with pytest.raises(mig.SimulatedFailure):
        mig.copy_table_resumable(
            spark, SMOKE_SF, dst, "orders", "o_orderkey", n_splits=8, fail_after=3
        )
    markers = sorted(f for f in os.listdir(dst) if f.endswith(".done"))
    assert len(markers) == 3
    stamps = {m: os.path.getmtime(os.path.join(dst, m)) for m in markers}

    copied = mig.copy_table_resumable(
        spark, SMOKE_SF, dst, "orders", "o_orderkey", n_splits=8
    )
    # all 8 ranges now done; the first 3 markers were not rewritten
    assert len([f for f in os.listdir(dst) if f.endswith(".done")]) == 8
    for m, ts in stamps.items():
        assert os.path.getmtime(os.path.join(dst, m)) == ts
    assert copied.count() == src.count()
    a = mig.content_checksum(src.select("o_orderkey", "o_orderstatus"), "orders").collect()
    b = mig.content_checksum(copied.select("o_orderkey", "o_orderstatus"), "orders").collect()
    assert a == b


def test_ddl_emission_maps_types(spark):
    schema = load_table(spark, SMOKE_SF, "orders").schema
    ddl = cass.ddl_for(schema, "ks", "orders", ["o_orderkey"], ["o_orderdate"])
    assert "CREATE TABLE IF NOT EXISTS ks.orders" in ddl
    assert "o_orderkey bigint" in ddl
    assert "o_orderdate timestamp" in ddl
    assert "PRIMARY KEY ((o_orderkey), o_orderdate)" in ddl


def test_cluster_config_conf_shape():
    cfg = cass.ClusterConfig(hosts=("h1", "h2"), username="u", password="p")
    conf = cfg.spark_conf()
    assert conf["spark.cassandra.connection.host"] == "h1,h2"
    assert conf["spark.cassandra.auth.username"] == "u"
    opts = cass.reader_options("ks", "t", writetime_cols=("v",), ttl_cols=("v",))
    assert opts["writetime.v"] == "v_writetime"
    assert opts["ttl.v"] == "v_ttl"


def test_throttled_copy_pacing_schedule(spark, tmp_path):
    """A10: with a fake clock, the pacing schedule is exact — before
    range i starts, virtual time >= rows_copied_before_i / rate; with
    no rate, no sleeps; the copied table is identical either way."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators import migrate as mig
    from cassandra_migrate_keyspace_from_cluster_spark.queries.part_a_migration import (
        _FakeClock,
    )

    sf = "/root/testdata/sf0.001"
    rate = 500.0
    clock = _FakeClock()
    out = mig.copy_table_throttled(
        spark, sf, str(tmp_path / "thr"), "orders", "o_orderkey",
        n_splits=4, rows_per_second=rate, clock=clock,
    )
    src = spark.read.parquet(f"{sf}/orders.parquet")
    assert out.count() == src.count()
    assert out.exceptAll(src).count() == 0 and src.exceptAll(out).count() == 0
    counts = [
        r.n_rows
        for r in mig.range_split_counts(src, "o_orderkey", 4).orderBy("bucket").collect()
    ]
    # ranges run sequentially: cumulative virtual time when the LAST
    # range starts must be >= everything-before / rate (clock only
    # advances via sleep, so the schedule is exact, not approximate)
    assert clock.slept, "throttle never paced"
    assert abs(clock.t - sum(counts[:-1]) / rate) < 1e-6
    # unthrottled: same bytes, zero sleeps
    clock2 = _FakeClock()
    out2 = mig.copy_table_throttled(
        spark, sf, str(tmp_path / "unthr"), "orders", "o_orderkey",
        n_splits=4, rows_per_second=None, clock=clock2,
    )
    assert not clock2.slept
    assert out2.exceptAll(out).count() == 0 and out.exceptAll(out2).count() == 0


def test_cluster_source_token_ranges(spark):
    """A1 connector simulation: one task per token range, ranges tile
    the table exactly, and uniform-hash tokens keep splits balanced."""
    from cassandra_migrate_keyspace_from_cluster_spark.sources.cluster_source import (
        read_keyspace_table,
        ring_ranges,
        token_of,
    )

    path = "/root/testdata/sf0.001/orders.parquet"
    df = read_keyspace_table(spark, path, "o_orderkey", n_ranges=8)
    assert df.rdd.getNumPartitions() == 8
    plain = spark.read.parquet(path)
    assert df.count() == plain.count()
    assert df.exceptAll(plain).count() == 0
    assert plain.exceptAll(df).count() == 0
    # ring math: ranges are half-open, disjoint, and cover the ring
    rng = ring_ranges(8)
    assert rng[0][0] == 0 and rng[-1][1] == 1 << 64
    assert all(rng[i][1] == rng[i + 1][0] for i in range(7))
    # balance: md5 tokens are uniform -> no split above 2x the mean
    sizes = (
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    assert len(sizes) == 8 and min(sizes) > 0
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))
    # determinism: the same key always lands in the same range
    assert token_of(42) == token_of(42)


def test_compacted_copy_file_count_and_values(spark):
    """a4f: compaction copy produces exactly ceil(rows/rows_per_file)
    parquet data files and preserves values."""
    import glob
    import os

    dst = tempfile.mkdtemp(prefix="spark_graft_test_a4f_")
    out = mig.copy_table_compacted(spark, SMOKE_SF, dst, "orders", rows_per_file=100)
    src = load_table(spark, SMOKE_SF, "orders")
    n_rows = src.count()
    expected_files = -(-n_rows // 100)
    files = glob.glob(os.path.join(dst, "orders.parquet", "part-*"))
    assert len(files) == expected_files, (len(files), expected_files)
    assert out.count() == n_rows
    assert out.exceptAll(src).count() == 0
    assert src.exceptAll(out).count() == 0


def test_snapshot_diff_empty_on_identical(spark):
    """snapshot_diff of a table against itself emits zero repair rows
    (drift-proportional output)."""
    orders = load_table(spark, SMOKE_SF, "orders")
    cols = ("o_orderkey", "o_orderstatus", "o_orderpriority")
    diff = mig.snapshot_diff(orders, orders, "o_orderkey", cols)
    assert diff.count() == 0


def test_snapshot_diff_null_and_delimiter_drift_detected(spark):
    r"""The row hash must be NULL- and delimiter-unambiguous: a row whose
    drift is only WHICH column is NULL, or a value that shifts the '|'
    delimiter across a column boundary, must still be reported changed
    (a naive concat_ws hash skips NULLs and collides on both)."""
    src = spark.createDataFrame(
        [(1, "a", None), (2, "x|y", "z"), (3, None, None)],
        "k int, c1 string, c2 string",
    )
    tgt = spark.createDataFrame(
        [(1, None, "a"), (2, "x", "y|z"), (3, None, None)],
        "k int, c1 string, c2 string",
    )
    diff = mig.snapshot_diff(src, tgt, "k", ("c1", "c2")).collect()
    assert {(r.k, r.status) for r in diff} == {(1, "changed"), (2, "changed")}


def test_copy_with_observed_metrics(spark):
    """Migration monitoring via DataFrame.observe(): the copy pipeline
    publishes row-count / sum metrics as a side effect of the ONE write
    pass (no second validation scan) — at 100 TB this is how per-batch
    QA counters come out of a copy for free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    dst = tempfile.mkdtemp(prefix="spark_graft_observe_")
    src = load_table(spark, SMOKE_SF, "orders")
    obs = Observation("copy_metrics")
    observed = src.observe(
        obs,
        F.count(F.lit(1)).alias("rows_copied"),
        F.round(F.sum("o_totalprice"), 2).alias("value_copied"),
        F.max("o_orderkey").alias("max_key"),
    )
    observed.write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    m = obs.get
    assert m["rows_copied"] == src.count()
    assert m["max_key"] == src.agg(F.max("o_orderkey")).collect()[0][0]
    got = spark.read.parquet(f"{dst}/orders.parquet")
    assert got.count() == m["rows_copied"]


def test_commitlog_reader_resyncs_cap_after_restart():
    """Checkpoint-restart contract of the commit-log reader: a fresh
    reader (admission cap 0) that learns a committed position via
    partitions()/commit() must never let latestOffset trail it —
    otherwise a restarted paced query reads empty batches until the
    cap catches up (the r4 ADVICE finding). Driver-side unit test: no
    Spark session, just the reader protocol."""
    from cassandra_migrate_keyspace_from_cluster_spark.sources.commitlog_stream import (
        CommitLogStreamReader,
    )

    path = f"{SMOKE_SF}/events.parquet"
    r = CommitLogStreamReader({"path": path, "n_slices": "2", "batch_rows": "100"})
    # simulated restart: the engine replays the checkpointed batch
    # [300, 400) before ever calling latestOffset
    r.partitions({"pos": 300}, {"pos": 400})
    nxt = r.latestOffset()["pos"]
    assert nxt >= 400, f"latestOffset {nxt} trails the restored position"
    # commit() alone must also raise the floor
    r2 = CommitLogStreamReader({"path": path, "n_slices": "2", "batch_rows": "100"})
    r2.commit({"pos": 500})
    assert r2.latestOffset()["pos"] >= 500


def test_commitlog_reader_rowgroup_pruned_slices():
    """The sliced reads must reconstruct the log exactly (no row lost
    or duplicated at row-group boundaries) and each slice must only
    yield its own [lo, hi) rows."""
    import pyarrow.parquet as pq

    from cassandra_migrate_keyspace_from_cluster_spark.sources.commitlog_stream import (
        CommitLogStreamReader,
        RowSlice,
    )

    path = f"{SMOKE_SF}/events.parquet"
    total = pq.ParquetFile(path).metadata.num_rows
    r = CommitLogStreamReader({"path": path, "n_slices": "4"})
    slices = r.partitions({"pos": 0}, {"pos": total})
    n = 0
    for sl in slices:
        got = sum(b.num_rows for b in r.read(sl))
        assert got == sl.hi - sl.lo
        n += got
    assert n == total
    # interior slice crossing a row-group boundary-sized span
    mid = RowSlice(total // 3, total // 3 + 57)
    assert sum(b.num_rows for b in r.read(mid)) == 57


def test_stage_content_key_reuse_and_worker_cache(spark):
    """_stage with a content_key must reuse a completed staging (same
    path, no rewrite) and produce a fresh path without one; the
    per-worker loader keeps exactly one corpus in memory."""
    import os

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        similarity as sim,
    )

    df = spark.range(10).selectExpr(
        "id", "array(cast(id as float), cast(id+1 as float)) as embedding"
    )
    p1 = sim._stage(df.select("id", "embedding"), "stage_test", content_key="k1")
    mtimes = {
        f: os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1)
    }
    p2 = sim._stage(df.select("id", "embedding"), "stage_test", content_key="k1")
    assert p1 == p2
    assert {
        f: os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1)
    } == mtimes, "completed staging was rewritten"
    p3 = sim._stage(df.select("id", "embedding"), "stage_test")
    assert p3 != p1
    ids1, mat1 = sim._load_normalized_corpus(p3)
    assert len(ids1) == 10 and mat1.shape == (10, 2)
    assert set(sim._WORKER_INDEX_CACHE) == {p3}
    # loading a different path evicts the previous entry (single-slot)
    p4 = sim._stage(df.select("id", "embedding"), "stage_test2", content_key="k2")
    sim._load_normalized_corpus(p4)
    assert set(sim._WORKER_INDEX_CACHE) == {p4}


def test_load_table_normalizes_timestamp_encodings(spark):
    """Fixture timestamp encodings have drifted across driver rounds
    (r1/r2 NANOS → r3 MICROS-NTZ); load_table must deliver plain
    TimestampType with identical wall-clock values for every plausible
    parquet encoding of the same data, so a future regen cannot break
    the query layer again."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_migrate_keyspace_from_cluster_spark.sources.parquet_keyspace import (
        load_table,
    )
    from cassandra_migrate_keyspace_from_cluster_spark.util import (
        scratch_dir_unique,
    )

    wall = [
        datetime.datetime(2024, 1, 1, 12, 0, 0),
        datetime.datetime(2024, 6, 15, 23, 59, 59, 123456),
    ]
    encodings = {
        "ns_ntz": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "ms_ntz": pa.timestamp("ms"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }
    for label, typ in encodings.items():
        vals = wall if typ.unit != "ms" else [w.replace(microsecond=0) for w in wall]
        tbl = pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array(vals, typ),
            }
        )
        d = scratch_dir_unique(f"ts_enc_{label}")
        pq.write_table(tbl, f"{d}/events.parquet")
        got = load_table(spark, d, "events")
        assert dict(got.dtypes)["ts"] == "timestamp", (label, got.dtypes)
        rows = {
            (r.event_id, r.ts.strftime("%Y-%m-%d %H:%M:%S.%f")[:23])
            for r in got.collect()
        }
        expect = {
            (i, v.strftime("%Y-%m-%d %H:%M:%S.%f")[:23])
            for i, v in enumerate(vals)
        }
        assert rows == expect, (label, rows, expect)


def test_wallclock_stable_under_session_timezone(spark):
    """Session-timezone invariance law (SURVEY §5.3 off-gate axis): the
    fixtures' timestamps are epoch-pinned on read (inferTimestampNTZ
    disabled), so without stabilization every rendered wall-clock,
    filter membership, and window bucket would follow
    spark.sql.session.timeZone — an environment accident the pinned-UTC
    session paths hide (measured: 24/207 queries drifted under
    Etc/GMT-8 before the loader fix). Three layers checked:

    1. under a UTC session the stabilizer is an IDENTITY (same object —
       plans unchanged, parquet pushdown preserved; plan test asserts
       the pushed filter separately);
    2. load_table renders identical wall-clocks under a fixed-offset
       non-UTC session for every fixture timestamp encoding;
    3. representative registered queries (filter membership b2, window
       bucketing e1, raw-epoch output d4) are cell-identical under
       Etc/GMT-8 vs UTC at sf0.001.
    """
    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
    from cassandra_migrate_keyspace_from_cluster_spark.sources.parquet_keyspace import (
        load_table,
        stabilize_wallclock,
    )

    sf = "/root/testdata/sf0.001"
    lineitem = load_table(spark, sf, "lineitem")
    assert stabilize_wallclock(lineitem) is lineitem  # layer 1: UTC no-op

    sp = specs()
    names = ["b2_filter_pred", "e1_tumbling", "d4_datetime"]
    base = {n: sp[n].fn(spark, sf).toPandas() for n in names}
    base_dates = load_table(spark, sf, "orders").select("o_orderdate").toPandas()
    try:
        spark.conf.set("spark.sql.session.timeZone", "Etc/GMT-8")
        pert_dates = (
            load_table(spark, sf, "orders").select("o_orderdate").toPandas()
        )
        assert base_dates.equals(pert_dates)  # layer 2
        for n in names:  # layer 3
            got = sp[n].fn(spark, sf).toPandas()
            cols = sorted(got.columns)
            b = base[n][cols].sort_values(by=cols).reset_index(drop=True)
            g = got[cols].sort_values(by=cols).reset_index(drop=True)
            assert b.astype(str).equals(g.astype(str)), n
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_sources_read_directory_shaped_tables(spark, tmp_path):
    """Multifile law (the physical truth at 100 TB: a table is a
    DIRECTORY of many writers' part files, a commitlog is segment
    files): load_table's footer sniff, the A1 cluster source, and the
    commitlog stream source must read a directory-shaped table
    identically to the single file it was split from. Parts carry
    heterogeneous writer profiles (zstd / dict-off / tiny row groups)
    — the lakemix matrix inside ONE table."""
    import pyarrow.parquet as pq

    from cassandra_migrate_keyspace_from_cluster_spark.sources.cluster_source import (
        read_keyspace_table,
    )
    from cassandra_migrate_keyspace_from_cluster_spark.sources.commitlog_stream import (
        read_commitlog_stream,
    )
    from cassandra_migrate_keyspace_from_cluster_spark.sources.parquet_keyspace import (
        list_part_files,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    tbl = pq.read_table(src)
    d = tmp_path / "events.parquet"
    d.mkdir()
    n = tbl.num_rows
    profiles = [
        dict(version="2.6", data_page_version="2.0", compression="zstd"),
        dict(use_dictionary=False, compression="snappy"),
        dict(compression="gzip", row_group_size=7),
    ]
    bounds = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        pq.write_table(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
            str(d / f"part-{i:02d}.parquet"),
            **profiles[i],
        )
    assert len(list_part_files(str(d))) == 3

    # load_table path: footer sniff must not crash on a directory, and
    # values must equal the single-file read
    from cassandra_migrate_keyspace_from_cluster_spark.sources import load_table

    got = load_table(spark, str(tmp_path), "events")
    want = load_table(spark, "/root/testdata/sf0.001", "events")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # A1 cluster source: per-part walk, same multiset
    cs = read_keyspace_table(spark, str(d), "event_id", n_ranges=4)
    assert cs.count() == n
    assert cs.exceptAll(want).count() == 0

    # commitlog stream: segment concatenation replays every row exactly
    # once (order-insensitive count + key-set equality via a batch sink)
    out_dir = tmp_path / "sink"
    q = (
        read_commitlog_stream(spark, str(d), n_slices=3, batch_rows=4000)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    replayed = spark.read.parquet(str(out_dir))
    assert replayed.count() == n
    assert replayed.select("event_id").exceptAll(want.select("event_id")).count() == 0
