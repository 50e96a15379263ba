"""Scoped persist tracking — explicit teardown for long-lived sessions.

Query functions return *lazy* DataFrames (the driver contract), so an
intermediate that is persisted for reuse inside a plan cannot be unpersisted
before the caller collects — it would silently recompute. Instead every
persist in this package goes through :func:`scoped_persist`, which records
the handle, and hosts that keep a session alive across many queries
(bench.py, notebook servers, tests) call :func:`release_persisted` after
each collect. Short-lived drivers get the same cleanup for free at session
teardown; Spark's ContextCleaner also reclaims handles dropped by GC.
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import DataFrame, SparkSession

# Thread-safety model: marks and since-slices are per-thread (a foreachBatch
# worker releasing its own scope can never unpersist a host thread's caches,
# and concurrent registrations in other threads can't shift its slice), while
# release_persisted() drains a token-keyed global registry under a lock so
# session teardown still frees every thread's handles exactly once.
_LOCK = threading.Lock()
_ALL: dict[int, DataFrame] = {}
_TOKENS = itertools.count()
_TLS = threading.local()


def _entries() -> list[tuple[int, DataFrame]]:
    try:
        return _TLS.entries
    except AttributeError:
        _TLS.entries = []
        return _TLS.entries


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later release_persisted()."""
    df = df.persist()
    with _LOCK:
        token = next(_TOKENS)
        _ALL[token] = df
    _entries().append((token, df))
    return df


def release_persisted() -> int:
    """Unpersist every scoped handle (all threads); returns how many."""
    with _LOCK:
        handles = list(_ALL.values())
        _ALL.clear()
    _entries().clear()
    n = 0
    for df in handles:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n


def persisted_count() -> int:
    """This thread's scope depth — pair with :func:`release_persisted_since`."""
    return len(_entries())


def release_persisted_since(mark: int) -> int:
    """Unpersist only this thread's handles registered after ``mark`` (a
    prior :func:`persisted_count`). For nested scopes (a foreachBatch body
    inside a long-lived host session) that must clean up their own caches
    without releasing the host's. Tokens already drained by a global
    :func:`release_persisted` are skipped, never double-released."""
    ent = _entries()
    pairs = ent[mark:]
    del ent[mark:]
    n = 0
    for token, df in pairs:
        with _LOCK:
            live = _ALL.pop(token, None) is not None
        if not live:
            continue
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n


def free_local_checkpoint(df: DataFrame) -> None:
    """Drop the storage blocks behind a ``localCheckpoint(eager=True)`` frame.

    ``DataFrame.unpersist`` only talks to the SQL cache manager and does not
    touch the RDD a checkpoint materialized, so iterative algorithms would
    otherwise hold every superseded iteration's blocks until driver GC. The
    checkpointed frame is unusable afterwards — only call this once a newer
    checkpoint has replaced it.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — non-checkpointed plan; nothing to free
        pass


def n_persistent_rdds(spark: SparkSession) -> int:
    """How many RDDs the context currently holds persisted (test hook)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
