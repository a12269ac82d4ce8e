"""Shared oracle-diff harness: run a Spark plan and a DuckDB oracle over the
same parquet tables and compare row count, schema kind, and order-insensitive
values (columns sorted by name, rows sorted by all columns) — the same
contract the external correctness gate applies."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from .catalog import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v
            )
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def single_partition_windows(df) -> list[str]:
    """Return the physical-plan lines of any WindowExec fed by an
    ``Exchange SinglePartition`` — the "Moving all data to a single
    partition" anti-pattern (an unpartitioned ``Window.orderBy``).

    A SinglePartition exchange under a final scalar HashAggregate is fine
    (partials combine map-side; one row moves); the same exchange under a
    Window/Sort moves EVERY row to one task, so only the Window shape is
    flagged.  In the printed tree a global window is::

        Window [...windowspecdefinition(...)], [key ASC]
        +- Sort [...], false, 0
           +- Exchange SinglePartition

    but under AQE the Sort and Exchange may be separated by interposed
    wrapper nodes (ShuffleQueryStage / AQEShuffleRead / ReusedExchange /
    InputAdapter / WholeStageCodegen), so the detector walks the chain of
    such pass-through nodes below the Window rather than a fixed two-line
    lookahead, stopping at the first node that could repartition."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return single_partition_windows_in_plan(plan)


# Nodes that sit between a Window and the Exchange that feeds it without
# changing the partitioning: the window's own Sort, AQE stage wrappers,
# and codegen plumbing.  Anything else ends the walk — a deeper
# SinglePartition exchange (e.g. under a nested scalar aggregate) is NOT
# feeding this window.
_WINDOW_PASSTHROUGH = (
    "Sort ",
    "ShuffleQueryStage",
    "AQEShuffleRead",
    "ReusedExchange",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
)


def _plan_node_body(line: str) -> str:
    """Strip tree art (``:  +-``) and codegen tags (``*(4)``) from a
    physical-plan line, leaving the node name onward."""
    body = line.lstrip(" :+-")
    if body.startswith("*("):
        _, _, body = body.partition(") ")
    return body


def single_partition_windows_in_plan(plan: str) -> list[str]:
    """String-level form of :func:`single_partition_windows` (shared with
    tools/audit_plans.py, which already holds the plan text)."""
    lines = plan.splitlines()
    hits: list[str] = []
    for i, line in enumerate(lines):
        if "Window" not in line or "windowspecdefinition" not in line:
            continue
        for nxt in lines[i + 1 :]:
            body = _plan_node_body(nxt)
            if "Exchange SinglePartition" in nxt:
                # direct child, or a ReusedExchange whose simpleString
                # names the reused SinglePartition exchange
                hits.append(line.strip())
                break
            if not body.startswith(_WINDOW_PASSTHROUGH):
                break
    return hits


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable diffs; empty list == match."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    scol, ocol = sorted(sdf.columns), sorted(odf.columns)
    if scol != ocol:
        problems.append(f"columns spark={scol} oracle={ocol}")
        return problems
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            svn = pd.to_numeric(sv, errors="coerce")
            ovn = pd.to_numeric(ov, errors="coerce")
            eq = (svn == ovn) | (svn.isna() & ovn.isna())
            ne = int((~eq).sum())
            if ne:
                idx = (~eq).idxmax()
                problems.append(f"col {c}: {ne} float mismatches e.g. {svn[idx]!r} vs {ovn[idx]!r}")
        else:
            sv2, ov2 = sv.astype(str), ov.astype(str)
            ne = int((sv2 != ov2).sum())
            if ne:
                idx = (sv2 != ov2).idxmax()
                problems.append(f"col {c}: {ne} mismatches e.g. {sv2[idx]!r} vs {ov2[idx]!r}")
    for c in s.columns:
        skind, okind = s[c].dtype.kind, o[c].dtype.kind
        if skind != okind:
            # int-vs-float pairs are flagged too: the external gate's value
            # hash is computed on the RENDERED frame, so an oracle column
            # DuckDB widened to HUGEINT (pandas float64: "877.0") mismatches
            # a Spark bigint ("877") even when every value is numerically
            # equal.  Exempting the pair here is exactly the hole that let
            # two un-CAST sum()-derived oracle columns ship red in round 5.
            problems.append(f"col {c}: dtype kind spark={s[c].dtype} oracle={o[c].dtype}")
    return problems
