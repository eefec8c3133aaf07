"""Synthesize a scale-S copy of the TESTDATA star schema for scaling runs.

Purpose: measure wall-clock RATIOS between a 1x and a 10x corpus of the
SAME generator (VERDICT r7 next-step 1). The driver fixtures are
read-only and single-row-group; this generator writes each big table as
a DIRECTORY of parquet part files with bounded row groups, so scans
parallelize at the file level exactly as a real lake layout would.

Distribution notes (profiled from /root/testdata/sf0.1, 2026-08-14):
- documents: ~60-token texts over a ~40-word tech vocab (Zipf-ish),
  lang mostly 'en', sources src0..src19, a SPARSE planted dup structure
  (~0.2% exact dups, ~1% near-dups with 1-2 token edits) so
  MinHash/CDC pair counts grow LINEARLY with corpus size — the property
  that makes a 1x-vs-10x wall ratio meaningful.
- embeddings: 64-dim float32, 10 labels with WEAK cluster signal (the
  fixture's max pairwise cosine is ~0.51, far under any dup threshold)
  plus ~1% planted near-dup partners (cos ~ 0.7-0.9) — again linear
  pair growth under the 0.40 LSH/SemDeDup threshold.
- lineitem/orders/customer/supplier/part/events: TPC-H-ish marginals
  matching the fixture's column names, dtypes, and value ranges.

Determinism: every table uses numpy Generator(PCG64(seed)) with
seed = 42 xor hash(table, scale) — same scale, same bytes.

Usage:
    python scripts/gen_scale_corpus.py --scale 1 --out /tmp/argodb_scale/x1
    python scripts/gen_scale_corpus.py --scale 10 --out /tmp/argodb_scale/x10
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 64 * 1024  # rows per parquet row group in big tables

#: sf0.1-equivalent row counts; scale multiplies these.
BASE = {
    "region": 5,
    "nation": 25,
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data vector "
    "join shuffle stage task codegen plan broadcast bucket skew page cache "
    "index commit"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "case", "drum", "pipe", "plate", "wheel", "gear"]
PADJ = ["large", "hot", "cold", "small", "red", "green", "steel", "soft"]
ETYPES = ["view", "click", "error", "purchase"]


def _rng(table: str, scale: float) -> np.random.Generator:
    h = hashlib.md5(f"{table}:{scale}".encode()).digest()
    return np.random.Generator(np.random.PCG64(42 ^ int.from_bytes(h[:8], "big")))


def _write(out: str, name: str, tbl: pa.Table, files: int) -> None:
    """Write `tbl` as a directory of `files` parquet parts (1 part for
    dims) with bounded row groups — the multi-split lake layout."""
    n = tbl.num_rows
    if n < ROW_GROUP or files <= 1:
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
        return
    d = os.path.join(out, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    per = (n + files - 1) // files
    for i in range(files):
        chunk = tbl.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(
                chunk, os.path.join(d, f"part-{i:05d}.parquet"), row_group_size=ROW_GROUP
            )


def gen_dims(out: str, scale: float, files: int) -> None:
    pq.write_table(
        pa.table({"r_regionkey": pa.array(range(5), pa.int64()), "r_name": REGIONS}),
        os.path.join(out, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int64()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        os.path.join(out, "nation.parquet"),
    )
    g = _rng("customer", scale)
    n = int(BASE["customer"] * scale)
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(g.integers(0, 25, n), pa.int32()),
                "c_acctbal": np.round(g.uniform(-999, 9999, n), 2),
                "c_mktsegment": pa.array(np.array(SEGMENTS)[g.integers(0, 5, n)]),
            }
        ),
        files,
    )
    g = _rng("supplier", scale)
    n = int(BASE["supplier"] * scale)
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(g.integers(0, 25, n), pa.int32()),
                "s_acctbal": np.round(g.uniform(-999, 9999, n), 2),
            }
        ),
        files,
    )
    g = _rng("part", scale)
    n = int(BASE["part"] * scale)
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n), pa.int64()),
                "p_name": [
                    f"{PADJ[a]} {PNOUNS[b]}"
                    for a, b in zip(g.integers(0, 8, n), g.integers(0, 8, n))
                ],
                "p_brand": [f"Brand#{i}" for i in g.integers(1, 26, n)],
                "p_type": pa.array(np.array(PTYPES)[g.integers(0, 6, n)]),
                "p_size": pa.array(g.integers(1, 51, n), pa.int32()),
                "p_retailprice": np.round(900 + g.uniform(0, 1200, n), 2),
            }
        ),
        files,
    )


def gen_facts(out: str, scale: float, files: int) -> None:
    n_cust = int(BASE["customer"] * scale)
    n_part = int(BASE["part"] * scale)
    n_supp = int(BASE["supplier"] * scale)

    g = _rng("orders", scale)
    n = int(BASE["orders"] * scale)
    dates = np.datetime64("1995-01-01") + g.integers(0, 2405, n).astype("timedelta64[D]")
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array(g.integers(0, n_cust, n), pa.int64()),
                "o_orderstatus": pa.array(np.array(["O", "F", "P"])[g.integers(0, 3, n)]),
                "o_totalprice": np.round(g.uniform(900, 500_000, n), 2),
                "o_orderdate": pa.array(dates.astype("datetime64[us]")),
                "o_orderpriority": pa.array(np.array(PRIORITIES)[g.integers(0, 5, n)]),
            }
        ),
        files,
    )

    g = _rng("lineitem", scale)
    n = int(BASE["lineitem"] * scale)
    sdates = np.datetime64("1995-01-01") + g.integers(0, 2405, n).astype("timedelta64[D]")
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(g.integers(0, int(BASE["orders"] * scale), n), pa.int64()),
                "l_partkey": pa.array(g.integers(0, n_part, n), pa.int64()),
                "l_suppkey": pa.array(g.integers(0, n_supp, n), pa.int64()),
                "l_linenumber": pa.array(g.integers(1, 8, n), pa.int32()),
                "l_quantity": g.integers(1, 51, n).astype("float64"),
                "l_extendedprice": np.round(g.uniform(900, 100_000, n), 2),
                "l_discount": np.round(g.integers(0, 11, n) / 100.0, 2),
                "l_tax": np.round(g.integers(0, 9, n) / 100.0, 2),
                "l_returnflag": pa.array(np.array(["N", "A", "R"])[g.integers(0, 3, n)]),
                "l_linestatus": pa.array(np.array(["O", "F"])[g.integers(0, 2, n)]),
                "l_shipdate": pa.array(sdates.astype("datetime64[us]")),
            }
        ),
        files,
    )

    g = _rng("events", scale)
    n = int(BASE["events"] * scale)
    ts = np.datetime64("2024-01-01T00:00:00") + np.sort(
        g.integers(0, 90 * 86_400 * 1_000_000, n)
    ).astype("timedelta64[us]")
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                # Zipf-ish user activity: a minority of users produce most
                # events — the skew shape Gini/sessionize ops must absorb.
                "user_id": pa.array(
                    np.minimum(
                        g.zipf(1.3, n) % int(2_000 * scale), int(2_000 * scale) - 1
                    ).astype("int64")
                ),
                "event_type": pa.array(np.array(ETYPES)[g.integers(0, 4, n)]),
                "value": np.round(g.exponential(80, n), 2),
                "props": [f'{{"k": {int(k)}}}' for k in g.integers(0, 100, n)],
            }
        ),
        files,
    )


def gen_documents(out: str, scale: float, files: int) -> None:
    g = _rng("documents", scale)
    n = int(BASE["documents"] * scale)
    vocab = np.array(VOCAB)
    # Zipf token draw over the vocab (rank-frequency like the fixture).
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    zipf_w /= zipf_w.sum()
    lengths = np.clip(g.normal(58, 22, n).astype(int), 12, 120)
    texts = [
        " ".join(vocab[g.choice(len(vocab), size=int(ln), p=zipf_w)]) for ln in lengths
    ]
    # Planted dup structure, LINEAR in n: 0.2% exact copies of an
    # earlier doc, 1% near-dups (2 token positions mutated).
    n_exact, n_near = max(1, n // 500), max(1, n // 100)
    for i in g.choice(np.arange(n // 2, n), size=n_exact, replace=False):
        texts[i] = texts[int(i) - n // 2]
    for i in g.choice(np.arange(n // 4, n // 2), size=n_near, replace=False):
        toks = texts[int(i) - n // 4].split()
        for p in g.choice(len(toks), size=min(2, len(toks)), replace=False):
            toks[int(p)] = vocab[g.integers(0, len(vocab))]
        texts[i] = " ".join(toks)
    langs = np.where(g.random(n) < 0.9, "en", np.array(["de", "fr", "es"])[g.integers(0, 3, n)])
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": texts,
                "lang": pa.array(langs),
                "source": pa.array([f"src{int(s)}" for s in g.integers(0, 20, n)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        files,
    )


def gen_embeddings(out: str, scale: float, files: int) -> None:
    g = _rng("embeddings", scale)
    n, d = int(BASE["embeddings"] * scale), 64
    labels = g.integers(0, 10, n).astype("int32")
    # Weak cluster signal (fixture max pairwise cos ~0.51): same-label
    # expected cosine |mu|^2/(|mu|^2 + sigma^2 d) ~ 0.2 — below every
    # dup threshold, so cluster membership alone never creates pairs.
    mus = g.normal(0, 0.05, (10, d))
    vecs = mus[labels] + g.normal(0, 0.10, (n, d))
    # ~1% planted near-dup partners: partner = base + small noise
    # (cos ~0.8) — the only above-threshold pairs, linear in n.
    n_pairs = max(1, n // 100)
    base_ids = g.choice(n // 2, size=n_pairs, replace=False)
    for b in base_ids:
        partner = int(b) + n // 2
        vecs[partner] = vecs[int(b)] + g.normal(0, 0.035, d)
        labels[partner] = labels[int(b)]
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row for row in vecs.astype("float32")], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        files,
    )


def gen_skew_facts(out: str, scale: float, files: int) -> None:
    """Zipf-skewed join/agg stress variant (VERDICT r8 next-step 3):
    orders as usual, but lineitem's l_orderkey puts ~20% of all rows on
    ONE hot key (key 0) and Zipf(1.2)-distributes the rest — the
    shape where an unsalted shuffle join/agg develops a straggler
    reducer. Only the two tables the skew bench reads are written."""
    n_orders = int(BASE["orders"] * scale)
    g = _rng("orders", scale)
    n = n_orders
    dates = np.datetime64("1995-01-01") + g.integers(0, 2405, n).astype("timedelta64[D]")
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array(g.integers(0, int(BASE["customer"] * scale), n), pa.int64()),
                "o_orderstatus": pa.array(np.array(["O", "F", "P"])[g.integers(0, 3, n)]),
                "o_totalprice": np.round(g.uniform(900, 500_000, n), 2),
                "o_orderdate": pa.array(dates.astype("datetime64[us]")),
                "o_orderpriority": pa.array(np.array(PRIORITIES)[g.integers(0, 5, n)]),
            }
        ),
        files,
    )

    g = _rng("lineitem_skew", scale)
    n = int(BASE["lineitem"] * scale)
    n_hot = n // 5  # one key carries 20% of the fact table
    tail = np.minimum(g.zipf(1.2, n - n_hot) % n_orders, n_orders - 1).astype("int64")
    keys = np.concatenate([np.zeros(n_hot, dtype="int64"), tail])
    g.shuffle(keys)
    sdates = np.datetime64("1995-01-01") + g.integers(0, 2405, n).astype("timedelta64[D]")
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(keys, pa.int64()),
                "l_partkey": pa.array(g.integers(0, int(BASE["part"] * scale), n), pa.int64()),
                "l_suppkey": pa.array(g.integers(0, int(BASE["supplier"] * scale), n), pa.int64()),
                "l_linenumber": pa.array(g.integers(1, 8, n), pa.int32()),
                "l_quantity": g.integers(1, 51, n).astype("float64"),
                "l_extendedprice": np.round(g.uniform(900, 100_000, n), 2),
                "l_discount": np.round(g.integers(0, 11, n) / 100.0, 2),
                "l_tax": np.round(g.integers(0, 9, n) / 100.0, 2),
                "l_returnflag": pa.array(np.array(["N", "A", "R"])[g.integers(0, 3, n)]),
                "l_linestatus": pa.array(np.array(["O", "F"])[g.integers(0, 2, n)]),
                "l_shipdate": pa.array(sdates.astype("datetime64[us]")),
            }
        ),
        files,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, required=True, help="multiplier over sf0.1 sizes")
    ap.add_argument("--out", required=True)
    ap.add_argument("--files", type=int, default=8, help="part files per big table")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="write only the Zipf-skewed orders+lineitem pair for the skew bench",
    )
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    if a.skew:
        gen_skew_facts(a.out, a.scale, a.files)
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(a.out)
            for f in fs
        )
        print(f"wrote SKEW scale={a.scale} corpus to {a.out} ({total/1e6:.1f} MB)")
        return
    gen_dims(a.out, a.scale, a.files)
    gen_facts(a.out, a.scale, a.files)
    gen_documents(a.out, a.scale, a.files)
    gen_embeddings(a.out, a.scale, a.files)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(a.out)
        for f in fs
    )
    print(f"wrote scale={a.scale} corpus to {a.out} ({total/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
