"""Python worker daemon with the engine's kernel libraries preloaded.

Spark forks every Python UDF worker from one long-lived daemon process
(``pyspark.daemon``). The engine's Arrow kernels (minhash, CDC chunking,
centroid assignment, perplexity, multimodal decoders) all import
numpy/pandas/pyarrow at task start — on a fresh session the FIRST
Python stage pays that import in every one of the (up to) 32 forked
workers concurrently, measured at 2-8 s of per-task blocking on this
box (guide §4.5: heavyweight init belongs before the fork, amortised
over every task).

Importing those modules HERE — in the daemon, before any fork — makes
each worker inherit the loaded modules through copy-on-write fork
memory: worker startup returns to process-fork cost. This is plugged in
via the documented ``spark.python.daemon.module`` conf (session.py) and
changes nothing about worker semantics — ``pyspark.daemon.manager()``
still runs the standard protocol.
"""

from __future__ import annotations

# Preload order mirrors import weight: pandas pulls numpy and dateutil;
# pyarrow is what Arrow-serialized UDF batches deserialize through.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
