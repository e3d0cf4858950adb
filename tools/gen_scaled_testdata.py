"""Generate an N×-scaled copy of a testdata dir for scale validation.

The driver ships sf0.001/0.01/0.1 only; SCALE.md's 1000× analysis is
worth an empirical check, so this tool builds a larger dir (default
10× sf0.1 ≈ sf1: ~6M-row lineitem) by unioning N key-shifted copies of
each table. The scaling preserves WORKLOAD SHAPE, not just row count:

- fact/dim keys shift per copy by a large offset, so join fan-outs,
  group cardinalities and per-key densities match the source exactly
  (each copy is an isolated replica of the original key graph);
- document text gets a per-copy token suffix (copy 0 untouched), so
  shingle/minhash/simhash sets are DISJOINT across copies — the dedup
  workload is exactly N× the original, not an N²-pair explosion of
  artificial near-duplicates;
- embeddings are circularly rotated per copy, preserving the norm and
  component distribution while moving each copy's vectors to a
  different region of the sphere — ANN bucket densities stay ~flat.

Usage: python tools/gen_scaled_testdata.py [--src DIR] [--out DIR] [--n 10]

Output goes under /tmp by default (the repo never writes to
/root/testdata).
"""

from __future__ import annotations

import argparse
import os

import duckdb

KEY_OFFSET = 10_000_000

# table -> (key columns to shift per copy)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def copy_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    shifted = SHIFTS[table]
    exprs = []
    for name, _typ in cols:
        if name in shifted:
            exprs.append(f"{name} + {i} * {KEY_OFFSET} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            # per-copy disjoint vocabulary, same length distribution
            exprs.append(
                "array_to_string(list_transform(string_split(text, ' '), "
                f"w -> w || '_c{i}'), ' ') AS text"
            )
        elif table == "embeddings" and name == "embedding" and i > 0:
            exprs.append(
                f"list_concat(embedding[{i + 1}:], embedding[1:{i}]) "
                "AS embedding"
            )
        else:
            exprs.append(name)
    return f"SELECT {', '.join(exprs)} FROM src"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf_scaled")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for t in COPY_AS_IS + list(SHIFTS):
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
        )
        if t in COPY_AS_IS:
            q = "SELECT * FROM src"
        else:
            cols = [
                (r[0], r[1])
                for r in con.execute("DESCRIBE SELECT * FROM src").fetchall()
            ]
            q = " UNION ALL ".join(
                copy_select(t, cols, i) for i in range(args.n)
            )
        dst = f"{args.out}/{t}.parquet"
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
