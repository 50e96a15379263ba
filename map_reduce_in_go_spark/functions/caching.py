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

from pyspark.sql import DataFrame, SparkSession

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later release_persisted()."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every scoped handle; returns how many were released."""
    n = 0
    for df in _SCOPED:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _SCOPED.clear()
    return n


def persisted_count() -> int:
    """Current scope depth — pair with :func:`release_persisted_since`."""
    return len(_SCOPED)


def release_persisted_since(mark: int) -> int:
    """Unpersist only handles registered after ``mark`` (a prior
    :func:`persisted_count`). For nested scopes (a foreachBatch body inside
    a long-lived host session) that must clean up their own caches without
    releasing the host's."""
    n = 0
    for df in _SCOPED[mark:]:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    del _SCOPED[mark:]
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
