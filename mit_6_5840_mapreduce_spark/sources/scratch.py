"""Process-lifetime scratch directories for queries that materialize
intermediate files (format round trips, streaming file sources/sinks).

Each named scratch dir is wiped and recreated on every request and the
single root is removed at interpreter exit — so repeated gate/bench runs
reuse one path instead of leaking a fresh ``tempfile.mkdtemp`` per run
(ADVICE r3: the old per-call mkdtemp dirs were never removed).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(name: str) -> str:
    """Return a fresh, empty scratch subdirectory for ``name``."""
    d = os.path.join(_root(), name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def scratch_path(name: str) -> str:
    """The path ``scratch_dir(name)`` would return, WITHOUT wiping it.
    For oracle SQL that must reference an artifact a query materializes
    (e.g. ``read_parquet('<scratch_path>/...')``): the path is stable
    for the process lifetime, so it can be embedded in an ORACLES
    string at module import and still point at whatever the Spark side
    wrote when the oracle later runs."""
    return os.path.join(_root(), name)


def materialize_scratch(spark, df, name: str, marker=None):
    """The validated-artifact bridge (round 8): write ``df`` (plus an
    optional nonce ``marker`` frame, unioned by name) to
    ``scratch_dir(name)/res`` and return the read-back DataFrame — so
    the rows the engine RETURNS are exactly the rows the DuckDB oracle
    will read back from ``scratch_path(name)/res/*.parquet`` and
    error()-validate. One shared helper so the round-trip convention
    (subdir layout, overwrite mode, readback) cannot drift between the
    sketch, search, and trainer artifact queries."""
    out = os.path.join(scratch_dir(name), "res")
    if marker is not None:
        df = df.unionByName(marker)
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)
