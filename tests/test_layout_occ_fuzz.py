"""Multi-writer OCC fuzz: four concurrent writers (append / DV delete /
DV merge / copy-on-write update / full-clause MERGE) plus a
maintenance thread hammer ONE manifest table. Each writer's mutations touch only ITS OWN key space,
so the final content is deterministic regardless of interleaving — any
divergence means a lost update, a torn commit, or a vacuum eating a
live file. The version log must also stay a consistent chain."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.layout import (
    ManifestConflictError,
    append_files,
    delete_rows,
    maintain_table,
    manifest_versions,
    merge_rows,
    read_table,
    update_rows,
)

N_THREADS = 4
N_ROUNDS = 4
ROWS_PER_APPEND = 40


def _retry(fn, attempts=30):
    for _ in range(attempts):
        try:
            return fn()
        except ManifestConflictError:
            continue
    raise AssertionError(f"{fn} lost {attempts} OCC races in a row")


def test_multi_writer_occ_fuzz(spark, tmp_path):
    target = str(tmp_path / "fuzz")
    # seed commit so every thread starts against an existing table
    append_files(
        spark, target,
        spark.createDataFrame([(-1, -1, -1, 0.0)], "t int, seq int, k int, v double"),
    )
    errors: list[BaseException] = []

    def writer(t: int):
        try:
            for rnd in range(N_ROUNDS):
                base = rnd * ROWS_PER_APPEND
                rows = [
                    (t, rnd, t * 1_000_000 + base + i, float(base + i))
                    for i in range(ROWS_PER_APPEND)
                ]
                df = spark.createDataFrame(
                    rows, "t int, seq int, k int, v double"
                )
                # append (auto-rebases internally)
                append_files(spark, target, df)
                if rnd % 2 == 0:
                    # DV delete of THIS thread's low-v rows of the round
                    _retry(lambda: delete_rows(
                        spark, target,
                        f"t = {t} AND seq = {rnd} AND v < {base + 10}",
                        mode="dv",
                    ))
                elif t % 2 == 0:
                    # DV merge: bump 10 of this thread's keys, insert 5 new
                    upd = spark.createDataFrame(
                        [(t, rnd, t * 1_000_000 + base + i, float(base + i) + 0.5)
                         for i in range(10)]
                        + [(t, rnd, t * 1_000_000 + 900_000 + rnd * 10 + i, 77.0)
                           for i in range(5)],
                        "t int, seq int, k int, v double",
                    )
                    _retry(lambda: merge_rows(
                        spark, target, upd, on="k", mode="dv"
                    ))
                elif rnd == 3:
                    # full-clause MERGE restricted to this thread's
                    # rnd-3 slice: matched delete + conditional update
                    # + insert + not-matched-by-source delete, all
                    # keyed to OUR key space so the outcome stays
                    # interleaving-independent
                    src = spark.createDataFrame(
                        [(t, rnd, t * 1_000_000 + base + i, float(base + i))
                         for i in range(20)]
                        + [(t, rnd, t * 1_000_000 + 950_000 + i, 88.0)
                           for i in range(3)],
                        "t int, seq int, k int, v double",
                    )
                    _retry(lambda: merge_rows(
                        spark, target, src, on="k", mode="dv",
                        when_matched_delete=f"s.v < {base + 5}",
                        when_matched_update={"v": "t.v + 0.25"},
                        when_not_matched_insert="s.v > 80.0",
                        when_not_matched_by_source_delete=(
                            f"t.t = {t} AND t.seq = 3 AND t.v > {base + 35}"
                        ),
                    ))
                else:
                    # COW update of this thread's round slice
                    _retry(lambda: update_rows(
                        spark, target,
                        f"t = {t} AND seq = {rnd}",
                        {"v": "v + 1000.0"},
                        mode="cow",
                    ))
        except BaseException as e:  # noqa: BLE001 — surfaced in the assert
            errors.append(e)

    stop = threading.Event()

    def maintainer():
        while not stop.is_set():
            try:
                maintain_table(
                    spark, target, target_file_bytes=1 << 30,
                    min_unclustered=6, max_dv_files=3,
                    retain_versions=0, grace_seconds=600.0,
                )
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(N_THREADS)]
    m = threading.Thread(target=maintainer, daemon=True)
    m.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    stop.set()
    m.join(timeout=120)
    assert not errors, f"writer/maintainer crashed: {errors[0]!r}"

    # expected content, computed per-thread (interleaving-independent)
    expected = [(-1, -1, -1, 0.0)]
    for t in range(N_THREADS):
        for rnd in range(N_ROUNDS):
            base = rnd * ROWS_PER_APPEND
            rows = {
                t * 1_000_000 + base + i: (t, rnd, t * 1_000_000 + base + i,
                                           float(base + i))
                for i in range(ROWS_PER_APPEND)
            }
            if rnd % 2 == 0:  # the DV delete
                rows = {
                    k: r for k, r in rows.items() if not r[3] < base + 10
                }
            elif t % 2 == 0:  # the DV merge
                for i in range(10):
                    k = t * 1_000_000 + base + i
                    rows[k] = (t, rnd, k, float(base + i) + 0.5)
                for i in range(5):
                    k = t * 1_000_000 + 900_000 + rnd * 10 + i
                    rows[k] = (t, rnd, k, 77.0)
            elif rnd == 3:  # the full-clause MERGE
                for i in range(5):
                    rows.pop(t * 1_000_000 + base + i)
                for i in range(5, 20):
                    k = t * 1_000_000 + base + i
                    rows[k] = (t, rnd, k, float(base + i) + 0.25)
                for i in range(36, 40):
                    rows.pop(t * 1_000_000 + base + i)
                for i in range(3):
                    k = t * 1_000_000 + 950_000 + i
                    rows[k] = (t, rnd, k, 88.0)
            else:  # the COW update
                rows = {
                    k: (r[0], r[1], r[2], r[3] + 1000.0)
                    for k, r in rows.items()
                }
            expected.extend(rows.values())

    got = sorted(map(tuple, read_table(spark, target, merge_schema=True).collect()))
    assert got == sorted(expected)

    # version log is a consistent strictly-increasing chain
    versions = manifest_versions(target)
    assert versions == sorted(set(versions))
    assert len(versions) >= N_THREADS * N_ROUNDS  # every commit recorded

    # round-14: the change feed composed over the ENTIRE contended
    # history (every commit type above is CDC-recorded; maintenance
    # compactions are recorded noops) folds the seed snapshot to the
    # final content — losers' retries must not leak change rows, and
    # the pull must be the composed path (no snapshot-diff Except)
    from dbt_slabbing_spark.operators.layout import read_changes

    feed = read_changes(spark, target, versions[1], versions[-1])
    assert "Except" not in feed._jdf.queryExecution().analyzed().toString()
    cols = ["t", "seq", "k", "v"]
    seed = read_table(spark, target, version=versions[1]).select(*cols)
    plus = feed.filter(F.col("_change_type") == "insert").select(*cols)
    minus = feed.filter(F.col("_change_type") == "delete").select(*cols)
    folded = sorted(
        map(tuple, seed.unionByName(plus).exceptAll(minus).collect())
    )
    assert folded == sorted(expected)
