"""Oracle-stability probe: every oracle SQL string must be a
DETERMINISTIC function of the data multiset — identical results across
DuckDB thread counts and repeated runs, on pristine AND tie-heavy
(dup2-perturbed) fixtures.

Why this exists (SURVEY.md §5.3 posture — probe off-gate axes the
per-round driver cannot see): the r8 dup2 probe produced two FULL-RUN
failures (e14 once, e16 once across ~10 passes) that re-passed every
isolated re-run. Chasing them exposed the two-pass tie law (§5.4):
DuckDB's window tie ORDER varies with thread scheduling, so an oracle
that chains two window sorts over a NON-TOTAL order can attach
pass-1-derived values to different duplicate copies run-to-run — the
output VALUE multiset itself flickers. Such an oracle passes the parity
gate whenever the scheduler happens to agree with Spark and flakes a
driver round whenever it doesn't.

This probe makes that class a checked law instead of an intermittency
hunt: for every oracle-paired query, run the SAME SQL on the SAME
parquet under ``SET threads ∈ {1, 2, 4, 8}`` × R fresh-connection
repeats and demand cell-exact agreement (tests/parity.py — the one
normalization every gate shares). Thread count is the strongest
scheduling-perturbation knob DuckDB exposes: threads=1 forces a serial
total order while 8 maximizes morsel interleaving, so a tie-order
dependence that CAN diverge almost surely does within the matrix.

Two fixture sets per run:
  pristine  the gate fixtures themselves — catches float-sum
            reassociation (parallel partial aggregates) and any
            intra-fixture ties (events has none on (ts, event_id),
            documents/orders have value-level ties everywhere);
  dup2      every row exactly twice (tools/data_shift.perturb_dup2) —
            EVERY row is a tie on every key, the regime that exposed
            e14/e16. head3/nulls/etc. shrink or null data but add no
            ties, so they add nothing on this axis.

Spark never runs here: this is an oracle-QUALITY gate (the oracle is
half of every correctness row, and an unstable oracle is a latent
driver flake even when the Spark side is perfect). The Spark↔oracle
agreement itself is the parity suite's job.

Rows-only queries have no oracle and do not appear. Oracles using
DuckDB sketch/sample functions would be legitimately thread-sensitive —
none of ours do (asserted by this probe staying at zero divergences).

Usage: python tools/oracle_stability.py [sf_dir] [repeats]
       (defaults: /root/testdata/sf0.001, 2)
       OS_ONLY=e14,e16 restricts to a comma-list of name prefixes.
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

THREADS = [1, 2, 4, 8]


def run_once(sql: str, fx_dir: str, threads: int):
    """One fresh-connection execution (fresh connection per run so no
    catalog/optimizer state can carry an accidental order between
    repeats)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"SET threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{fx_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
    from tests.parity import compare_frames
    from tools.data_shift import perturb_dup2

    only = os.environ.get("OS_ONLY")
    prefixes = tuple(p.strip() for p in only.split(",")) if only else None

    oracles = {
        name: spec.oracle
        for name, spec in specs().items()
        if spec.oracle is not None
        and (prefixes is None or name.startswith(prefixes))
    }

    dup_dir = tempfile.mkdtemp(prefix="oracle_stability_dup2_")
    fails: list[str] = []
    t_all = time.time()
    try:
        perturb_dup2(sf_dir, dup_dir)
        for fx_name, fx_dir in [("pristine", sf_dir), ("dup2", dup_dir)]:
            for name, sql in oracles.items():
                t0 = time.time()
                base = None
                status = "STABLE"
                for threads in THREADS:
                    for rep in range(repeats):
                        try:
                            df = run_once(sql, fx_dir, threads)
                        except Exception as exc:  # noqa: BLE001
                            status = f"ERROR threads={threads}: {exc}"
                            fails.append(f"{fx_name}/{name}")
                            break
                        if base is None:
                            base = df
                            continue
                        try:
                            compare_frames(base, df, name)
                        except AssertionError as diff:
                            status = (
                                f"UNSTABLE threads={threads} rep={rep}: "
                                + str(diff).splitlines()[0][:160]
                            )
                            fails.append(f"{fx_name}/{name}")
                            break
                    if status != "STABLE":
                        break
                print(
                    f"{fx_name}/{name}: {status} ({time.time() - t0:.1f}s)",
                    flush=True,
                )
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)

    n = 2 * len(oracles)
    print(
        f"ORACLE-STABILITY RESULT: {n - len(fails)}/{n} in "
        f"{time.time() - t_all:.0f}s ({len(oracles)} oracles x pristine+dup2 "
        f"x threads {THREADS} x {repeats} repeats); "
        f"FAILS: {', '.join(fails) if fails else 'none'}"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
