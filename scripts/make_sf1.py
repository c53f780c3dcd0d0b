"""Synthesize an sf1-equivalent dataset (10x the sf0.1 bench tables).

The driver environment ships sf{0.001,0.01,0.1}; the full-lane scale
sweep (BENCH_SF1.json) needs one more decade.  Ten key-shifted replicas
of sf0.1 preserve every join relationship (each replica's foreign keys
point into its own replica; nation/region stay the shared fixed
dimensions, exactly TPC-H's scaling model):

- fact/dim keys shift by replica * (max_key + 1) consistently across
  tables (orders.o_custkey moves with customer.c_custkey, etc.);
- ``documents``: replica k > 0 applies a character substitution cipher
  (rotate a-z/A-Z/0-9 by k) — ten corpora of the ORIGINAL's internal
  duplicate/near-dup structure (a bijection preserves all substring
  equalities) with no cross-replica similarity down to the char-gram
  level (replicating text verbatim — or salting only at token
  boundaries — leaves cross-replica grams equal and quadratically
  explodes the dedup/LCS lanes — the wrong scaling model for a
  10x-bigger crawl);
- ``embeddings``: replica k permutes the 64 dims with seed k — norms
  and within-replica geometry intact, cross-replica clusters broken
  (verbatim copies would 10x the exact-dup vector count);
- ``events``: event ids and user ids shift; timestamps keep their range
  (10x the users at the same per-user density — the production shape).

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/es_sf1_v1), marker-guarded.
Pure pyarrow/numpy — no Spark session needed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/es_sf1_v1")
REPLICAS = 10
_TAG = "v2"

#: key columns shifted per replica, grouped by the entity whose max
#: defines the stride (so foreign keys move with their parents)
_SHIFTS = {
    "customer": {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "supplier": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "part": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "orders": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "events": {"events": ["event_id"]},
    "user": {"events": ["user_id"]},
    "documents": {"documents": ["doc_id"]},
    "embeddings": {"embeddings": ["vec_id"]},
}


def _strides(tables: dict[str, pa.Table]) -> dict[str, int]:
    out = {}
    for entity, refs in _SHIFTS.items():
        tab, cols = next(iter(refs.items())), None
        # stride from the OWNING table's key (first entry by convention)
        own_table, own_cols = tab
        col = tables[own_table].column(own_cols[0])
        out[entity] = int(pa.compute.max(col).as_py()) + 1
    return out


def _shift_map(table_name: str, strides: dict[str, int]) -> dict[str, int]:
    m: dict[str, int] = {}
    for entity, refs in _SHIFTS.items():
        for col in refs.get(table_name, []):
            m[col] = strides[entity]
    return m


def _salt_texts(texts: list, k: int) -> tuple[list, list]:
    """Per-replica character substitution cipher (rotate within a-z, A-Z,
    0-9 by k).

    A bijection on the alphabet preserves EVERY within-replica substring
    equality and inequality — the replica's internal dup/near-dup
    structure is carried over exactly — while making any cross-replica
    character-gram containing a letter or digit unequal by construction.
    The earlier token-SUFFIX salt failed that goal for char-gram lanes:
    20-char grams inside long tokens carry no salt, so gram document
    frequencies merged across replicas (measured: 84M lcs_pairs
    nominations at sf1 vs 670k at sf0.1, a 125x blowup that filled the
    sandbox disk with shuffle spill; with the cipher, cross-replica gram
    equality is structurally impossible outside all-punctuation runs)."""
    import string

    r = k % 26
    d = k % 10
    lo, up, dg = string.ascii_lowercase, string.ascii_uppercase, string.digits
    tr = str.maketrans(
        lo + up + dg,
        lo[r:] + lo[:r] + up[r:] + up[:r] + dg[d:] + dg[:d],
    )
    salted, n_chars = [], []
    for t in texts:
        s = (t or "").translate(tr)
        salted.append(s)
        n_chars.append(len(s))
    return salted, n_chars


def main() -> None:
    marker = os.path.join(OUT, "_built")
    if os.path.exists(marker) and open(marker).read() == _TAG:
        print(f"already built at {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)
    names = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    tables = {n: pq.read_table(os.path.join(SRC, f"{n}.parquet")) for n in names}
    strides = _strides(tables)

    for name in names:
        src = tables[name]
        if name in ("region", "nation"):  # shared fixed dimensions
            pq.write_table(src, os.path.join(OUT, f"{name}.parquet"))
            continue
        shifts = _shift_map(name, strides)
        replicas = []
        for k in range(REPLICAS):
            cols = {}
            for field in src.schema:
                arr = src.column(field.name)
                if field.name in shifts and k > 0:
                    arr = pa.compute.add(
                        arr, pa.scalar(k * shifts[field.name], arr.type)
                    )
                cols[field.name] = arr
            if name == "documents" and k > 0:
                salted, n_chars = _salt_texts(
                    src.column("text").to_pylist(), k
                )
                cols["text"] = pa.array(salted, pa.string())
                cols["n_chars"] = pa.array(n_chars, pa.int64())
            if name == "embeddings" and k > 0:
                vecs = np.asarray(
                    src.column("embedding").to_pylist(), dtype=np.float32
                )
                perm = np.random.default_rng(k).permutation(vecs.shape[1])
                cols["embedding"] = pa.array(
                    [row.tolist() for row in vecs[:, perm]],
                    pa.list_(pa.float32()),
                )
            replicas.append(
                pa.table({f.name: cols[f.name] for f in src.schema})
            )
        out = pa.concat_tables(replicas)
        pq.write_table(out, os.path.join(OUT, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} -> {out.num_rows}")
    with open(marker, "w") as fh:
        fh.write(_TAG)
    print(f"built {OUT}")


if __name__ == "__main__":
    sys.exit(main())
