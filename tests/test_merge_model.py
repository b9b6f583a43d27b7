"""Randomized model test for the PK merge path (the engine's heart):
a multi-round mixed upsert/delete workload replayed against a pure
Python dict model — per-round state, time travel to every recorded
version, and the composed changelog must all agree with the model.

Deterministic seed: failures reproduce exactly; the point is a DIFFERENT
oracle shape than the DuckDB SQL parity suite (sequential stateful
semantics rather than single-query equivalence).
"""

from __future__ import annotations

import random

from fluss_iceberg_spark.lake.table import LakeCatalog


def test_pk_merge_matches_dict_model(spark, tmp_path):
    rng = random.Random(42)
    cat = LakeCatalog(spark, str(tmp_path / "whmodel"))
    df0 = spark.createDataFrame([(0, 0)], "k int, v long")
    t = cat.create_table(
        "model_t", df0.schema, primary_key=["k"], n_buckets=4
    )
    model: dict[int, int] = {}
    history: list[tuple[int, dict[int, int]]] = []
    for rnd in range(6):
        ups = {
            rng.randrange(30): rng.randrange(1000)
            for _ in range(rng.randrange(1, 12))
        }
        dels = {k for k in list(model) if rng.random() < 0.25} - set(ups)
        udf = spark.createDataFrame(sorted(ups.items()), "k int, v long")
        ddf = (
            spark.createDataFrame([(k,) for k in sorted(dels)], "k int")
            if dels
            else None
        )
        t.merge(udf, deletes=ddf)
        model.update(ups)
        for k in dels:
            model.pop(k, None)
        got = {r.k: r.v for r in t.read().collect()}
        assert got == model, f"state diverged at round {rnd}"
        history.append((t.current_version(), dict(model)))
    # time travel: every recorded version reproduces its model snapshot
    for v, m in history:
        got = {r.k: r.v for r in t.read(version=v).collect()}
        assert got == m, f"time travel to v{v} diverged"
    # the per-commit changelog, composed to net changes, must transform
    # the FIRST recorded state into the final model (changelog_stream
    # diffs consecutive retained snapshots, so the base is version 0's
    # state, not the empty table)
    base_v, base_state = history[0]
    log = t.changelog_stream(base_v)
    net = t.compose_changelog(log).collect()
    replayed = dict(base_state)
    for r in net:
        if r.op == "delete":
            replayed.pop(r.k, None)
        else:
            replayed[r.k] = r.v
    assert replayed == model, "composed changelog diverged from model"
