"""Conf-sensitivity invariance probe: every registered query must
produce IDENTICAL results under runtime-conf perturbations that change
the physical execution but not the declared semantics.

Why this exists (SURVEY.md §5.3 posture — probe off-gate axes the
per-round driver cannot see): the gate compares Spark vs DuckDB at two
fixed conf points (build_session and the driver's plain session). A
query can pass both yet silently depend on a physical accident:

  - per-Arrow-batch state in a mapInPandas/applyInPandas body (top-k,
    normalization, or an accumulator that resets per batch) — invisible
    until a different maxRecordsPerBatch re-chunks the stream;
  - AQE coalescing/skew-split as a SEMANTIC crutch (e.g. an operator
    that only deduplicates within a post-coalesce partition);
  - shuffle-partition-count sensitivity (partition-local logic leaking
    into a global answer).

Each perturbation below is runtime-settable, so one session runs the
baseline then re-runs the inventory per perturbation and compares
cell-exact with the SAME normalization as every other gate
(tests/parity.py — representation quirks cannot pass/fail differently
across gates).

Oracle-paired queries must match cell-exact. Rows-only queries
(c6/c7/c24/f3/f5/f5b/f33/f42b — seeded sketches whose exact output
legitimately depends on merge/partition order, which is precisely what
these perturbations change) are reported as WARN on drift and FAIL only
on error/empty: their semantic floors live in dedicated recall/
containment pytest laws, not in byte equality.

Usage: python tools/conf_invariance.py [sf_dir] [perturbation ...]
       (defaults: /root/testdata/sf0.001, all perturbations)
       A '+'-joined name (e.g. shuffle_5+tiny_splits+aqe_off) applies
       the perturbations TOGETHER — interaction probing: each axis
       holding alone does not imply the combination holds (e.g. AQE-off
       removes the coalescing that masks a tiny-splits-sensitive
       accumulator). The deep randomized version of this axis lives in
       tools/property_hunt.py (family `confs`).
Prints one line per (perturbation, divergence) and a final summary.
"""

from __future__ import annotations

import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> {conf: perturbed_value}; baseline values are read from the
# live session before perturbing and restored after, so perturbations
# cannot leak into each other.
PERTURBATIONS = {
    # Default 10000: at sf0.001 every document/embedding table re-chunks
    # into many tiny batches — any per-batch state in a Python-crossing
    # operator changes the answer.
    "arrow_batch_7": {"spark.sql.execution.arrow.maxRecordsPerBatch": "7"},
    # AQE off: no runtime coalescing, no skew split, no runtime
    # bloom/broadcast demotion. Results must not depend on any of it.
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    # build_session pins 32; 5 is coprime with nothing we rely on and
    # forces different hash-partition placement for every shuffle.
    "shuffle_5": {"spark.sql.shuffle.partitions": "5"},
    # Session timezone: the grading driver's plain session inherits the
    # box TZ (UTC here), but on a real cluster spark.sql.session.timeZone
    # can be anything — results must not depend on that accident. The
    # fixtures' naive (NTZ-encoded) timestamps round-trip through the
    # loader's interpret-in-session-TZ cast and every display converts
    # back through the same TZ, so all naive-rendered values and all
    # epoch DIFFERENCES are invariant by construction; what this probe
    # catches is RAW epoch leakage (unix_timestamp output on a value
    # whose declared semantics are "naive = UTC instant"). A FIXED
    # OFFSET zone is deliberate: DST zones make the naive->epoch
    # interpretation ill-defined in gap/fold hours (a data problem, not
    # an engine bug); a WHOLE-HOUR offset keeps hour/30-min tumbling
    # and sliding window boundaries aligned. Etc/GMT-8 = UTC+8 (POSIX
    # sign inversion), no DST anywhere in its history.
    "tz_utc_plus8": {"spark.sql.session.timeZone": "Etc/GMT-8"},
    # Whole-stage codegen off: every expression evaluates through the
    # interpreted/fallback path instead of generated Java. Codegen vs
    # interpreted divergence is a classic engine-bug class (rounding,
    # overflow, null-handling inconsistencies between the two
    # evaluators); results must be identical either way.
    "codegen_off": {"spark.sql.codegen.wholeStage": "false"},
    # ANSI mode off (Spark 4 defaults it ON): overflow and invalid
    # casts return NULL instead of raising. No query may RELY on
    # either behavior — every cast in the inventory is
    # domain-validated, so flipping the mode must not change a cell
    # (a query whose answer depends on error-vs-null semantics is a
    # portability bug against engines without ANSI mode).
    "ansi_off": {"spark.sql.ansi.enabled": "false"},
    # Auto-broadcast off: every non-hinted equi-join falls back to
    # sort-merge/shuffled-hash. Join STRATEGY must never be
    # semantic — a query whose answer depends on broadcast-vs-shuffle
    # placement (e.g. partition-local state in a Python-crossing op
    # fed by the join) is broken on any cluster where the small side
    # outgrows the threshold. Explicit F.broadcast() hints still
    # apply (they are part of the declared plan, not an accident).
    "broadcast_off": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    # Vectorized parquet reader off: scans decode row-at-a-time
    # through parquet-mr instead of the columnar batch reader. A
    # classic engine-divergence class (timestamp/decimal/null decode
    # differences between the two readers); also removes the
    # columnar-to-row boundary AQE sees, shifting stage shapes.
    "parquet_rowwise": {"spark.sql.parquet.enableVectorizedReader": "false"},
    # Tiny input splits: 64 KiB maxPartitionBytes re-splits every
    # file scan into many input partitions (the sandbox default is
    # 128 MiB = one partition per fixture file). On a 100-TB cluster
    # every scan IS multi-split — any per-input-partition logic
    # (first-row-of-file assumptions, per-partition accumulators in
    # mapInPandas sources) diverges the moment splits multiply.
    "tiny_splits": {"spark.sql.files.maxPartitionBytes": "65536",
                    "spark.sql.files.openCostInBytes": "0"},
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wanted = sys.argv[2:] or list(PERTURBATIONS)
    unknown = [w for w in wanted
               if any(p not in PERTURBATIONS for p in w.split("+"))]
    if unknown:
        sys.exit(f"unknown perturbation(s): {unknown}; have {list(PERTURBATIONS)}")
    # resolve '+'-combos into merged conf dicts (later axes win on a
    # conf-key collision, which cannot happen today — axes are disjoint)
    resolved = {}
    for w in wanted:
        merged: dict[str, str] = {}
        for p in w.split("+"):
            merged.update(PERTURBATIONS[p])
        resolved[w] = merged

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
    from tests.parity import compare_frames

    spark = build_session(app_name="conf_invariance")
    spark.sparkContext.setLogLevel("ERROR")
    all_specs = specs()

    t_all = time.time()
    print(f"baseline: {len(all_specs)} queries at {sf_dir}", flush=True)
    baseline: dict[str, object] = {}
    base_err: dict[str, str] = {}
    for name, spec in all_specs.items():
        try:
            baseline[name] = spec.fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — record, probe the rest
            base_err[name] = f"{type(ex).__name__}: {str(ex)[:160]}"
    if base_err:
        for name, err in base_err.items():
            print(f"BASELINE-ERROR {name}: {err}", flush=True)

    fails: list[str] = []
    warns: list[str] = []
    for pname in wanted:
        confs = resolved[pname]
        saved = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        t_p = time.time()
        n_ok = 0
        try:
            for name, spec in all_specs.items():
                if name in base_err:
                    continue
                rows_only = spec.oracle is None
                try:
                    got = spec.fn(spark, sf_dir).toPandas()
                    compare_frames(baseline[name], got, f"{pname}/{name}")
                    n_ok += 1
                except AssertionError as diff:
                    line = str(diff).splitlines()[0][:200]
                    if rows_only:
                        warns.append(f"{pname}/{name}")
                        print(f"WARN drift (rows-only) {pname}/{name}: {line}",
                              flush=True)
                    else:
                        fails.append(f"{pname}/{name}")
                        print(f"FAIL {pname}/{name}: {line}", flush=True)
                except Exception as ex:  # noqa: BLE001
                    fails.append(f"{pname}/{name}")
                    print(f"FAIL {pname}/{name}: {type(ex).__name__}: "
                          f"{str(ex)[:160]}", flush=True)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        print(f"{pname}: {n_ok}/{len(all_specs) - len(base_err)} identical "
              f"({time.time() - t_p:.0f}s)", flush=True)

    print(
        f"CONF-INVARIANCE RESULT: perturbations={wanted} "
        f"fails={fails or 'none'} rows-only-drift={warns or 'none'} "
        f"baseline-errors={sorted(base_err) or 'none'} "
        f"({time.time() - t_all:.0f}s)"
    )
    sys.exit(1 if (fails or base_err) else 0)


if __name__ == "__main__":
    main()
