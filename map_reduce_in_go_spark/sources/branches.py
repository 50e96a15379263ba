"""Zero-copy catalog branches with fast-forward merge (r11).

The Nessie/Iceberg-branch posture over :class:`~.catalog.TableCatalog`:
a BRANCH is a sibling catalog LEDGER (``_catalog@<name>`` under the same
root) whose first commit copies the main timeline's pin rows — O(#tables)
metadata, zero data movement. Branch writers run ordinary transactions:
member tables are shared append-only manifest logs, so branch commits
mint new member versions that main simply never references (and vice
versa); isolation falls out of version pinning, the same way racing
transactions already isolate. GC and member-log truncation were taught
to protect EVERY ledger's pins (catalog.py vacuum/checkpoint_members),
which is what makes the zero-copy share safe.

Merge is FAST-FORWARD ONLY and says so: if main has not moved past the
fork point, one CAS republishes the branch's pins onto main; if main
moved, :func:`merge_branch` refuses with the per-member divergence
(which members each side touched) rather than inventing a 3-way member
merge — for additive members a union-merge is plausible future work, but
a wrong merge is worse than a loud refusal. ``drop_branch`` deletes the
ledger; the branch's member versions become unreferenced and age out of
branch-aware vacuum.

Writer identity: ``acquire_app_id`` leases are ROOT-scoped on purpose.
Op labels cross timelines (a branch inherits main's committed ops; a
merge flows the branch's back), so a main writer and a branch writer
sharing an ``app_id`` could silently alias each other's batch ids as
replays across the fork — give each experiment its own ``app_id`` and
the root-level lease makes any collision loud.

Reference parity: none — the reference engine has no catalogs. This
extends the repo's lakehouse arc (transactions → replication → PITR
clone → time travel → branches).

At 100 TB: creating a branch writes one parquet file of pin rows;
experiments write only their own deltas; merge publishes one manifest.
Nothing is ever copied because a timeline is just a pointer table.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession

from .catalog import CommitConflict, TableCatalog

__all__ = [
    "branch",
    "branch_divergence",
    "create_branch",
    "describe_history",
    "drop_branch",
    "fork_point",
    "list_branches",
    "merge_branch",
]

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")
_FORK_RE = re.compile(r"^branch-from-v(\d+)$")


def _ledger(name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(
            f"invalid branch name {name!r}: use [A-Za-z0-9._-], start "
            "alphanumeric, max 64 chars"
        )
    return f"_catalog@{name}"


def branch(cat: TableCatalog, name: str) -> TableCatalog:
    """Handle for branch ``name`` of ``cat``'s root (same member tables,
    its own ledger). Works for reads and ordinary transactions alike."""
    return TableCatalog(cat.root, ledger=_ledger(name))


def create_branch(
    spark: SparkSession, cat: TableCatalog, name: str
) -> TableCatalog:
    """Fork the CURRENT snapshot of ``cat`` into a new branch — one
    metadata commit, zero data copied.

    The fork point (main's catalog version) is recorded in the branch's
    first op label; :func:`merge_branch` uses it for the fast-forward
    check. Refuses an existing branch and an empty main (there is no
    snapshot to fork)."""
    if cat.ledger != "_catalog":
        raise ValueError(
            "branches fork from the main timeline only; nested branching "
            f"from {cat.ledger!r} would make merge provenance ambiguous"
        )
    v = cat.version()
    if v < 0:
        raise ValueError(f"catalog at {cat.root} has no snapshot to branch")
    br = branch(cat, name)
    if br.version() >= 0:
        raise ValueError(f"branch {name!r} already exists at {cat.root}")
    pins = cat.snapshot(spark, v)
    # exactly-once must survive the fork: the branch inherits every op
    # label main had committed, so a pre-fork batch replayed onto the
    # branch is detected as a replay (see TableCatalog.committed_ops)
    import json

    os.makedirs(os.path.join(cat.root, br.ledger), exist_ok=True)
    with open(
        os.path.join(cat.root, br.ledger, "inherited_ops.json"), "w"
    ) as f:
        json.dump(sorted(cat.committed_ops()), f)
    # the fork version also lives in a sidecar: the branch ledger's own
    # checkpoints may truncate the branch-from manifest's op label
    with open(os.path.join(cat.root, br.ledger, "fork.json"), "w") as f:
        json.dump({"fork_version": v}, f)
    br._publish(spark, pins, expected_version=-1, op=f"branch-from-v{v}")
    return br


def fork_point(br: TableCatalog) -> int:
    """Main-catalog version this branch forked from (the ``fork.json``
    sidecar, falling back to the first commit's op label for ledgers
    predating it)."""
    import json

    sidecar = os.path.join(br.root, br.ledger, "fork.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return int(json.load(f)["fork_version"])
    hist = br.history()
    if not hist:
        raise ValueError(f"no branch ledger at {br.root}/{br.ledger}")
    m = _FORK_RE.match(hist[0][1])
    if not m:
        raise ValueError(
            f"ledger {br.ledger!r} does not start with a branch-from "
            f"commit (op {hist[0][1]!r}); not a branch?"
        )
    return int(m.group(1))


def branch_divergence(
    spark: SparkSession, cat: TableCatalog, name: str
) -> dict[str, list[str]]:
    """Which members each side changed since the fork point.

    ``{"main": [...], "branch": [...]}`` — empty "main" means the merge
    can fast-forward. Comparison is by PIN (path, version), the same
    identity the catalog itself serves by."""
    br = branch(cat, name)
    fork_v = fork_point(br)
    base = cat.snapshot(spark, fork_v)
    main_now = cat.snapshot(spark)
    br_now = br.snapshot(spark)

    def _changed(now: dict) -> list[str]:
        names = set(base) | set(now)
        return sorted(n for n in names if base.get(n) != now.get(n))

    return {"main": _changed(main_now), "branch": _changed(br_now)}


def merge_branch(
    spark: SparkSession, cat: TableCatalog, name: str
) -> int:
    """Fast-forward ``cat`` (main) to branch ``name``'s snapshot.

    One CAS at the fork version: if main has not committed since the
    fork, its pointer table simply becomes the branch's pins (all of the
    branch's member versions are already durable — merge publishes, it
    does not move data). If main moved, refuses with the per-member
    divergence on BOTH sides; re-branch from the new main and replay the
    experiment, or retract the conflicting main commits first. Returns
    the new main version. The branch ledger is left intact (it keeps
    working as a read handle; drop it explicitly)."""
    br = branch(cat, name)
    fork_v = fork_point(br)
    if cat.version() != fork_v:
        div = branch_divergence(spark, cat, name)
        raise CommitConflict(
            f"cannot fast-forward: main advanced v{fork_v} → "
            f"v{cat.version()} since branch {name!r} forked; members "
            f"touched — main: {div['main'] or '[]'}, branch: "
            f"{div['branch'] or '[]'}. Re-branch from the new main and "
            "replay, or resolve main's commits first."
        )
    pins = br.snapshot(spark)
    v = cat._publish(
        spark, pins, expected_version=fork_v, op=f"merge-{name}-v{br.version()}"
    )
    # exactly-once must survive the merge too (the mirror image of the
    # fork's inherited ops): the branch's batch op labels flow into
    # main's sidecar, so a merged batch replayed against MAIN is a
    # ledger no-op, not a double-apply. Written after the CAS — if two
    # mergers race, the CAS loser never reaches here.
    import json

    sidecar = os.path.join(cat.root, cat.ledger, "inherited_ops.json")
    have: set[str] = set()
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            have = set(json.load(f))
    with open(sidecar, "w") as f:
        json.dump(sorted(have | br.committed_ops()), f)
    return v


def list_branches(spark: SparkSession, cat: TableCatalog):
    """(branch, fork_version, version, n_commits) rows for every branch
    of ``cat``'s root — the timeline inventory, from metadata alone."""
    rows = []
    for led in cat.branch_ledgers():
        name = led.split("@", 1)[1]
        br = branch(cat, name)
        rows.append((name, fork_point(br), br.version(), len(br.history())))
    return spark.createDataFrame(
        rows or [("", -1, -1, -1)],
        "branch string, fork_version long, version long, n_commits long",
    ).filter("fork_version >= 0 OR branch != ''")


def describe_history(spark: SparkSession, cat: TableCatalog):
    """(version, op, n_members) per catalog commit, ascending — the
    DESCRIBE HISTORY verb. Versions below the catalog ledger's own
    checkpoint horizon are omitted (their op labels survive only in the
    consolidated replay set), same retention trade as the time-travel
    reads."""
    rows = []
    for v, op in cat.history():
        try:
            n = len(cat.snapshot(spark, v))
        except FileNotFoundError:
            continue
        rows.append((v, op, n))
    return spark.createDataFrame(
        rows or [(-1, "", -1)], "version long, op string, n_members long"
    ).filter("version >= 0")


def drop_branch(cat: TableCatalog, name: str) -> None:
    """Delete branch ``name``'s ledger. Its unreferenced member versions
    age out of the (branch-aware) vacuum; shared files stay owned by the
    remaining ledgers' pins."""
    path = os.path.join(cat.root, _ledger(name))
    if not os.path.isdir(path):
        raise ValueError(f"no branch {name!r} at {cat.root}")
    shutil.rmtree(path)
