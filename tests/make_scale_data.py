"""Generate an sf1-EQUIVALENT dataset (default 10x sf0.1) for the
round-10 scale sweep: tile the driver's sf0.1 parquet tables with
deterministic id / time / vector offsets so every schema quirk and
distribution of the real testdata survives, at 10x the rows.

    python tests/make_scale_data.py [out_dir] [replicas] [src_dir]

Defaults: /tmp/flint_sf1, 10, /root/testdata/sf0.1. Pure DuckDB (no
JVM): ~6M lineitem / 1.5M orders / 1M events / 50k documents / 20k
embeddings in well under a minute.

Tiling rules (replica r = 0..R-1; r=0 is the original data verbatim):
- fact ids (o_orderkey/l_orderkey, event_id, doc_id, vec_id) shift by
  r * 10_000_000 — replicas stay disjoint and orders<->lineitem keys
  stay consistent, so every join gate still joins;
- dimension tables (region nation customer supplier part) are NOT
  tiled: dims keep dim-table size, exactly the broadcast-join posture
  the engine assumes at 100 TB;
- event timestamps shift by r * 13 microseconds: same time range (the
  fixed-date clock gates still cover it), no wholesale ts collisions
  across replicas;
- document texts get a 2-token replica suffix (and n_chars is
  recomputed): every document gains 9 NEAR-duplicates — a deliberate
  stress for the MinHash/Jaccard/repeated-span family whose pair
  joins grow superlinearly in duplicate density;
- embeddings perturb component 1 by r * 1e-4 (FLOAT-cast): distinct
  vectors, no cosine ties between replicas.

The output is throwaway (/tmp): the committed artifact is this script
plus the sweep log — the evidence is reproducible, not stored.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_VERBATIM = ["region", "nation", "customer", "supplier", "part"]


def tile_sql(table: str, src: str, r: int) -> str:
    """SELECT for replica ``r`` of ``table`` (r=0 must be identity)."""
    off = r * 10_000_000
    f = f"read_parquet('{src}/{table}.parquet')"
    if table == "orders":
        return (f"SELECT o_orderkey + {off} AS o_orderkey, o_custkey, "
                f"o_orderstatus, o_totalprice, o_orderdate, "
                f"o_orderpriority FROM {f}")
    if table == "lineitem":
        return (f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey, "
                f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                f"l_discount, l_tax, l_returnflag, l_linestatus, "
                f"l_shipdate FROM {f}")
    if table == "events":
        return (f"SELECT event_id + {off} AS event_id, "
                f"ts + INTERVAL {r * 13} MICROSECOND AS ts, user_id, "
                f"event_type, value, props FROM {f}")
    if table == "documents":
        suffix = "" if r == 0 else f" || ' replica r{r}'"
        return (f"SELECT doc_id + {off} AS doc_id, text{suffix} AS text, "
                f"lang, source, length(text{suffix}) AS n_chars FROM {f}")
    if table == "embeddings":
        if r == 0:
            return f"SELECT * FROM {f}"
        return (f"SELECT vec_id + {off} AS vec_id, "
                f"list_prepend((embedding[1] + {r} * 1e-4)::FLOAT, "
                f"embedding[2:]) AS embedding, label FROM {f}")
    raise ValueError(table)


def main(out_dir: str = "/tmp/flint_sf1", replicas: int = 10,
         src: str = "/root/testdata/sf0.1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES_VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied verbatim")
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        union = " UNION ALL ".join(tile_sql(t, src, r)
                                   for r in range(replicas))
        con.execute(f"COPY ({union}) TO '{out_dir}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM "
                    f"read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n:,} rows ({replicas}x)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/flint_sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10,
         sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
