"""Mechanical enforcement of the broadcast-hint policy (docs/SCALE.md).

A forced ``broadcast()`` hint is reserved for frames whose cardinality
is BOUNDED independent of corpus size; a hint on an SF-growing side
works at gate SF and OOMs every executor at 100 TB. This lint walks
every ``broadcast(...)`` call in the package AST (comments/docstrings
can't false-positive) and requires the hinted expression to be on the
reviewed whitelist below — so adding a new hint forces the author to
classify the frame as bounded, here, on purpose.

The runtime twin is tests/test_join_strategy_invariance.py (de-hinted
queries must actually degrade to shuffle joins); this test covers the
sites that KEEP their hints and any future additions.
"""

from __future__ import annotations

import ast
import os

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "mit_6_5840_mapreduce_spark")

# Reviewed bounded frames (variable name -> why it is bounded).
ALLOWED_NAMES = {
    # fixed dims: TPC-H pins region=5, nation=25 rows at ANY SF
    "nation", "nation_c", "nation_s", "region",
    # 1-row aggregates / scalar bounds
    "total", "totals", "mm", "maxd", "bounds", "top", "thresh",
    # model-sized tables: centroids, codebooks, LUTs, quantile cuts,
    # per-source/per-lang rate dims, CMS sketch cells, Bloom bit set
    # (carr = the r14 one-row collect_list'ed centroid array; cba =
    # the PQ codebook grouped to one codeword-array row per subspace —
    # PQ_M rows, model-sized)
    "cents", "cn", "cb", "lut", "cuts", "rates", "sketch", "bits",
    "carr", "cba",
    # broadcast query blocks (TOP_K queries, bounded by contract)
    "q",
    # constant literal dims (5-row value bands, stopword lexicon)
    "bands", "lex",
    # skyline candidates post-local-prune: bounded by the skyline size,
    # and one side of a non-equi anti join MUST broadcast (BNLJ)
    "b",
}

# Allowed call-expression hints: f(...) forms whose result is bounded.
ALLOWED_CALLS = {
    "_pq_codebook",     # K x subspaces codebook (model-sized)
    # ONE-row frame: all N_CENTROIDS centroids collect_list'ed into a
    # single array column (the r14 row-local assignment form) —
    # model-sized at any corpus scale, same bound as "cents"
    "_carr",
}

# _t(spark, sf_dir, "<table>") may be hinted only for fixed dims.
ALLOWED_TABLE_LOADS = {"region", "nation"}


def _broadcast_args():
    out = []
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path, encoding="utf-8") as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                fn = node.func
                name = (fn.id if isinstance(fn, ast.Name)
                        else fn.attr if isinstance(fn, ast.Attribute)
                        else None)
                if name != "broadcast" or not node.args:
                    continue
                rel = os.path.relpath(path, os.path.dirname(PKG))
                out.append((f"{rel}:{node.lineno}", node.args[0]))
    return out


def test_every_broadcast_hint_is_whitelisted_bounded():
    sites = _broadcast_args()
    assert sites, "no broadcast() hints found — lint is miswired"
    violations = []
    for loc, arg in sites:
        if isinstance(arg, ast.Name) and arg.id in ALLOWED_NAMES:
            continue
        # unwrap row-preserving chains (.select/.where/.alias/...) down
        # to the base expression: a projection of a bounded frame is
        # still bounded
        base = arg
        while (isinstance(base, ast.Call)
               and isinstance(base.func, ast.Attribute)
               and base.func.attr in ("select", "where", "filter",
                                      "alias", "withColumn", "distinct")):
            base = base.func.value
        if isinstance(base, ast.Name) and base.id in ALLOWED_NAMES:
            continue
        if isinstance(base, ast.Call):
            callee = base.func
            cname = (callee.id if isinstance(callee, ast.Name)
                     else callee.attr if isinstance(callee, ast.Attribute)
                     else None)
            if cname in ALLOWED_CALLS:
                continue
            if cname == "_t":
                tbl = base.args[-1]
                if (isinstance(tbl, ast.Constant)
                        and tbl.value in ALLOWED_TABLE_LOADS):
                    continue
        violations.append(f"{loc}: broadcast({ast.unparse(arg)})")
    assert not violations, (
        "broadcast() hint on an unreviewed frame — if its cardinality is "
        "bounded independent of corpus size, whitelist it here with the "
        "reason; if it grows with SF, remove the hint (docs/SCALE.md "
        "policy):\n" + "\n".join(violations))


@pytest.mark.parametrize("bad", ["cust", "part", "supp", "orders", "li",
                                 "dfreq", "cw", "build", "bad_supp"])
def test_known_growing_frames_not_whitelisted(bad):
    """The frames the r7 sweep de-hinted must never re-enter via the
    whitelist."""
    assert bad not in ALLOWED_NAMES


def test_no_inline_unconditional_widening_repartition():
    """Widening a narrow scan must go through sources.tables.fan_out
    (conditional on the scan's planned split count), never an inline
    ``repartition(defaultParallelism)`` — the unconditional form
    re-shuffles the whole corpus at production split counts (the r7
    fan_out finding). Keyed repartitions (by column) are fine: those
    ARE the intended partitioning, not a widening crutch."""
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path, encoding="utf-8") as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and node.func.attr == "repartition"
                        and node.args
                        and not any(isinstance(a, ast.Constant)
                                    and isinstance(a.value, str)
                                    for a in node.args)
                        and "defaultParallelism" in ast.unparse(node.args[0])):
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    if fname == "tables.py":   # fan_out itself
                        continue
                    offenders.append(f"{rel}:{node.lineno}")
    assert not offenders, (
        "inline repartition(defaultParallelism) — use fan_out() so the "
        "widening is conditional on the scan's split count:\n"
        + "\n".join(offenders))
