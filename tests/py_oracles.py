"""Linear-time Python reference oracles for the five gates whose DuckDB
oracles are recursive CTEs (r10 verdict item 4).

DuckDB replays a per-row recurrence as ``WITH RECURSIVE`` stepping via
an rn-join — O(n²) work and, for the transitive-closure cluster oracle,
combinatorial in clique size — which capped the r10 scale sweep at 2-3×
for exactly these five gates while everything else ran at sf1. The
operators themselves are linear; only their oracles weren't.

Each function here replays the SAME documented contract as the SQL
oracle, but as a chunked numpy/Python fold over the sorted rows (the
contract the streaming late-arrival tests already use), so the whole
168-gate registry can sweep at sf1 in one protocol. The SQL and Python
oracles are pinned equal at small SF by
``tests/test_extra_queries.py::test_py_oracle_matches_sql_oracle``;
the harness switches to these with ``HARNESS_PY_ORACLE=1``.

Independence note: the non-recursive *inputs* (token counts, the
simhash pair graph) still come from DuckDB SQL — only the linear
recurrence / closure is replayed in Python, with the arithmetic
written from the operator's documented recurrence (same float64 op
order), not imported from the operator code.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

DAY_NS = 86_400_000_000_000.0


def _r6(v: float) -> float:
    """entry_queries.common.R(col, 6): floor(x*1e6 + 0.5)/1e6 —
    half-up on the same double both engines hold."""
    return math.floor(v * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------
# next-fit packing walks
# ---------------------------------------------------------------------

def _next_fit_walk(ns: np.ndarray, budget: int):
    """Documented pack_bins contract: docs stay whole, a bin never
    exceeds ``budget`` (oversized docs get their own bin), 'non-empty'
    means HAS DOCUMENTS (the r10 zero-token rule), next-fit only."""
    bins = np.empty(len(ns), dtype=np.int64)
    b, fill, used = 0, 0, 0
    for i, n in enumerate(ns):
        n = int(n)
        if used > 0 and fill + n > budget:
            b, fill, used = b + 1, n, 1
        else:
            fill, used = fill + n, used + 1
        bins[i] = b
    return bins


def _doc_tokens(con) -> pd.DataFrame:
    return con.sql("""
      SELECT doc_id,
             COALESCE(len(string_split(text, ' ')), 0) AS n
      FROM documents ORDER BY doc_id
    """).df()


def pack_bins(con) -> pd.DataFrame:
    d = _doc_tokens(con)
    d["shard"] = d["doc_id"] % 4
    parts = []
    for shard, g in d.groupby("shard", sort=True):
        g = g.sort_values("doc_id", ignore_index=True)
        g["bin_id"] = _next_fit_walk(g["n"].to_numpy(), budget=96)
        parts.append(g)
    packed = pd.concat(parts, ignore_index=True)
    out = (packed.groupby(["shard", "bin_id"], as_index=False)
           .agg(n_docs=("doc_id", "size"), tokens=("n", "sum"),
                first_doc=("doc_id", "min")))
    out["shard"] = out["shard"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["tokens"] = out["tokens"].astype("int64")
    return out[["shard", "bin_id", "n_docs", "tokens", "first_doc"]]


def _balance_shards(d: pd.DataFrame, n_shards: int) -> pd.Series:
    """balance_shards contract: size-magnitude bucket (bit length - 1,
    0 for non-positive) + per-bucket round-robin over (tokens DESC,
    doc_id ASC) rank, rotated by the bucket id."""
    n = d["n"].astype("int64")
    bkt = n.map(lambda v: 0 if v <= 0 else int(v).bit_length() - 1)
    order = d.assign(__bkt=bkt).sort_values(
        ["__bkt", "n", "doc_id"], ascending=[True, False, True],
        kind="stable")
    rank = order.groupby("__bkt").cumcount()
    shard = ((rank + order["__bkt"]) % n_shards).astype("int32")
    return shard.reindex(d.index)


def shard_and_pack(con) -> pd.DataFrame:
    d = _doc_tokens(con)
    d["shard"] = _balance_shards(d, 4)
    parts = []
    for shard, g in d.groupby("shard", sort=True):
        g = g.sort_values("doc_id", ignore_index=True)
        g["bin_id"] = _next_fit_walk(g["n"].to_numpy(), budget=128)
        parts.append(g)
    out = pd.concat(parts, ignore_index=True)
    out["shard"] = out["shard"].astype("int32")
    return out[["doc_id", "shard", "bin_id"]]


# ---------------------------------------------------------------------
# connected components over the simhash pair graph
# ---------------------------------------------------------------------

def dedup_clusters(con) -> pd.DataFrame:
    from entry_queries.pipeline_q import _sql_simhash_pairs

    pairs = con.sql(_sql_simhash_pairs()).df()
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        root = a
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[a] != root:  # path compression
            parent[a], a = root, parent[a]
        return root

    for ia, ib in zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)):
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min reachable id: union-by-min keeps the root minimal
    members: dict[int, list[int]] = {}
    for node in list(parent):
        members.setdefault(find(node), []).append(node)
    rows = [(np.nan, np.nan, node, root)
            for root, ns in members.items() for node in ns]
    dropped = {node for root, ns in members.items()
               for node in ns if node != root}
    docs = con.sql("SELECT doc_id FROM documents").df()["doc_id"]
    kept = docs[~docs.isin(dropped)]
    rows.append((float(len(kept)), float(kept.sum()), -1, -1))
    out = pd.DataFrame(rows, columns=["n_kept", "kept_id_sum",
                                      "id", "cluster"])
    out["id"] = out["id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    return out


# ---------------------------------------------------------------------
# per-key float recurrences (kalman local level, Holt-Winters)
# ---------------------------------------------------------------------

def _events_sorted(con) -> pd.DataFrame:
    """Gate input rows in the engine's (time, value, event_id) tie
    order, with the operator's exact int64-ns time axis."""
    return con.sql("""
      SELECT user_id, event_id, epoch_us(ts) * 1000 AS tns, value AS x
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      ORDER BY user_id, epoch_us(ts), value, event_id
    """).df()


def kalman(con) -> pd.DataFrame:
    """operators.kalman documented recurrence: l=x, P=p0 at the first
    row; then P_pred = P + q*dt/period; gain = P_pred/(P_pred+r);
    l += gain*(x-l); P = (1-gain)*P_pred. Gate params q=4, r=25,
    p0=100, period=1d."""
    base = _events_sorted(con)
    q, r, p0 = 4.0, 25.0, 100.0
    out_kf = np.empty(len(base))
    i = 0
    for _, g in base.groupby("user_id", sort=False):
        t = g["tns"].to_numpy(dtype=np.int64)
        x = g["x"].to_numpy(dtype=np.float64)
        level, var, last_t = 0.0, 0.0, None
        for j in range(len(x)):
            if last_t is None:
                level, var = x[j], p0
            else:
                p_pred = var + q * max(t[j] - last_t, 0) / DAY_NS
                gain = p_pred / (p_pred + r)
                level = level + gain * (x[j] - level)
                var = (1.0 - gain) * p_pred
            last_t = int(t[j]) if last_t is None else max(last_t, int(t[j]))
            out_kf[i] = _r6(level)
            i += 1
    return pd.DataFrame({"event_id": base["event_id"],
                         "user_id": base["user_id"],
                         "kf": out_kf})


def holt_winters(con) -> pd.DataFrame:
    """operators.holtwinters documented recurrence (alpha=.4, beta=.2,
    gamma=.3, period=7, unit=1d): first row l=x, b=0, s=zeros; then
    l' = a(x - s[p]) + (1-a)(l+b); b' = B(l'-l) + (1-B)b;
    s[p] = g(x - l') + (1-g)s[p]; outputs (l', b', l'+s[p])."""
    base = _events_sorted(con)
    a, B, g_ = 0.4, 0.2, 0.3
    period, unit_ns = 7, 86_400_000_000_000
    n = len(base)
    out = np.empty((n, 3))
    i = 0
    for _, grp in base.groupby("user_id", sort=False):
        t = grp["tns"].to_numpy(dtype=np.int64)
        x = grp["x"].to_numpy(dtype=np.float64)
        init, level, trend = False, 0.0, 0.0
        seas = np.zeros(period)
        for j in range(len(x)):
            p = int((t[j] // unit_ns) % period)
            if not init:
                init, level, trend = True, x[j], 0.0
            else:
                prev = level
                level = a * (x[j] - seas[p]) + (1.0 - a) * (level + trend)
                trend = B * (level - prev) + (1.0 - B) * trend
                seas[p] = g_ * (x[j] - level) + (1.0 - g_) * seas[p]
            out[i] = (_r6(level), _r6(trend), _r6(level + seas[p]))
            i += 1
    return pd.DataFrame({"event_id": base["event_id"],
                         "user_id": base["user_id"],
                         "hw_level": out[:, 0], "hw_trend": out[:, 1],
                         "hw": out[:, 2]})


#: gate name -> replay; the harness consults this map when
#: HARNESS_PY_ORACLE=1 (all other gates keep their SQL oracles)
PY_ORACLES = {
    "pack_bins": pack_bins,
    "shard_and_pack": shard_and_pack,
    "dedup_clusters": dedup_clusters,
    "kalman": kalman,
    "holt_winters": holt_winters,
}
