"""Distributed t-digest quantile sketch (Dunning & Ertl 2019,
"Computing extremely accurate quantiles using t-digests").

The engine-opaque leg of the quantile family: where the bottom-k
quantile sketch (operators/sketches.py) trades accuracy for a fully
value-gated cross-engine replay, the t-digest is the production-grade
mergeable form — O(delta) centroids per group, rank error that
VANISHES at the tails (the k1 scale function squeezes centroid
capacity to one point as q -> 0 or 1), and digests that merge by
concatenate-and-recompress. Float centroid means make it rows-only at
the driver gate; the merge and accuracy properties are unit-pinned
instead (tests/test_tdigest.py).

Spark-first two-phase build (the same shape as the classifier's
moment aggregation — corpus touched once, model-sized rows move):

  phase 1 — ``mapInPandas`` over (group, value): each input partition
    compresses its rows into <= O(delta) weighted centroids PER GROUP,
    emitting (group, mean, weight) rows. Arrow-batched, map-side only,
    no shuffle of raw values.
  phase 2 — ``applyInPandas`` per group: concatenate the partial
    centroid sets (partitions x O(delta) rows — the ONLY shuffled
    data), recompress into one digest, read quantiles off it.

100 TB: raw values never shuffle; the exchange carries
|partitions| x |groups| x O(delta) centroid rows. Digests for
different days/partitions/CDC deltas merge the same way — phase 2 is
literally the merge operator, so incremental maintenance is "append
new centroid rows, re-run phase 2".

Reference parity: the reference stack exposes approximate quantiles
via Trino's qdigest/tdigest aggregates over Iceberg tables
(public Trino `tdigest_agg`); this is the PySpark-native equivalent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_CENTROID_SCHEMA = "grp string, mean double, weight double"


def _k1(q: float, delta: float) -> float:
    """The t-digest k1 scale function: k(q) = (delta / 2pi) *
    asin(2q - 1). Centroid capacity is the q-span where k rises by 1 —
    widest at q=0.5, a single point at the tails."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def compress(means, weights, delta: float = 100.0):
    """Merge sorted-by-mean weighted points into t-digest centroids:
    greedily absorb neighbours while the k1 bound allows (Dunning's
    merging-digest algorithm). Pure numpy; used by BOTH phases and the
    local reference, so the unit gates pin one implementation."""
    import numpy as np

    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    # lexsort on (mean, weight): ties between equal means are broken by
    # weight, so the merge is a pure function of the centroid MULTISET —
    # tick arrival order / Spark row order can never change the digest
    # (tests/test_tdigest.py::test_tick_merge_equals_oneshot_exactly)
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list = []
    out_w: list = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0  # total weight in already-emitted centroids
    k_lo = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_hi = (w_before + cur_w + float(w)) / total
        if _k1(q_hi, delta) - k_lo <= 1.0:
            cur_m += (float(m) - cur_m) * float(w) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_lo = _k1(w_before / total, delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def quantile(means, weights, q: float) -> float:
    """Read a quantile off a centroid set: centroid i sits at rank
    cum_i - w_i/2; linear interpolation between neighbouring centroid
    means (the standard t-digest estimator)."""
    import numpy as np

    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    order = np.lexsort((weights, means))  # multiset-canonical, see compress
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    span = cum[i + 1] - cum[i]
    frac = 0.0 if span <= 0 else (target - cum[i]) / span
    return float(means[i] + frac * (means[i + 1] - means[i]))


def tdigest_local(values, delta: float = 100.0):
    """Pure-local reference: (means, weights) digest of a value list
    (unit gate for merge/accuracy properties)."""
    import numpy as np

    v = np.asarray(list(values), dtype="float64")
    return compress(v, np.ones_like(v), delta)


def tdigest_centroids(
    df: DataFrame,
    value_col: str,
    group_col: str,
    delta: float = 100.0,
) -> DataFrame:
    """Phase 1 alone: the partial-centroid frame (grp, mean, weight).
    These rows ARE the mergeable sketch state — concatenating centroid
    frames from different partitions/days/micro-batches and re-running
    :func:`tdigest_merge_quantiles` is the merge operator, so streaming
    maintenance appends centroid rows and never revisits old data."""
    from fluss_iceberg_spark.operators.util import spread

    src = spread(df).select(
        df[group_col].cast("string").alias("grp"),
        df[value_col].cast("double").alias("val"),
    )

    def _partial(batches):
        import numpy as np
        import pandas as pd

        acc: dict = {}  # grp -> (means list, weights list)
        for pdf in batches:
            for g, vals in pdf.groupby("grp")["val"]:
                v = vals.to_numpy(dtype="float64")
                if not len(v):
                    continue
                m0, w0 = acc.get(g, ([], []))
                m, w = compress(
                    np.concatenate([np.asarray(m0), v]),
                    np.concatenate([np.asarray(w0), np.ones_like(v)]),
                    delta,
                )
                acc[g] = (m, w)
        if acc:
            yield pd.DataFrame(
                [(g, m, w) for g, (ms, ws) in acc.items()
                 for m, w in zip(ms, ws)],
                columns=["grp", "mean", "weight"],
            )

    return src.mapInPandas(_partial, _CENTROID_SCHEMA)


def tdigest_merge_quantiles(
    partials: DataFrame,
    qs: tuple = (0.5, 0.9, 0.99),
    delta: float = 100.0,
) -> DataFrame:
    """Phase 2 alone: merge a partial-centroid frame per group and read
    quantiles off the merged digest."""
    q_cols = [f"p{int(round(q * 1000))}_td" for q in qs]
    out_schema = "grp string, " + ", ".join(f"{c} double" for c in q_cols)

    def _merge(pdf):
        import pandas as pd

        m, w = compress(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy(), delta
        )
        row = {"grp": pdf["grp"].iloc[0]}
        for q, c in zip(qs, q_cols):
            row[c] = quantile(m, w, q)
        return pd.DataFrame([row])

    return partials.groupBy("grp").applyInPandas(_merge, out_schema)


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    delta: float = 100.0,
) -> DataFrame:
    """Distributed per-group t-digest quantiles. Returns one row per
    group with a ``p{milli}_td`` column per requested quantile."""
    return tdigest_merge_quantiles(
        tdigest_centroids(df, value_col, group_col, delta), qs, delta
    )
