"""Synthesize an sf1-equivalent dataset for the SCALING.md rehearsal
(VERDICT r05 item 6): 10 key-offset replicas of /root/testdata/sf0.1.

PERF-ONLY data — correctness oracles always run on the driver's own
testdata. Design choices that keep the 10x a faithful scale-up of the
WORKLOAD, not just the byte count:

- every key column is offset per replica (keys stay globally unique and
  join relationships stay consistent: lineitem.l_suppkey lands on the
  same replica's supplier, etc.) — so join/agg key cardinality grows
  10x like a real sf1;
- nation/region stay single-copy (fixed dims, like TPC-H);
- document text gets a per-replica suffix token and embeddings a
  per-replica first-component nudge — without this, identical docs/
  vectors across replicas would inflate near-dup PAIR counts ~100x
  (quadratic in replica count), which is a different workload, not 10x
  the data.

Usage: python tools/make_sf1.py [out_dir]   (default scratch/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
# multiple of 10 so o_orderkey % 10-style batch filters keep their
# selectivity in every replica; far above any sf0.1 key
OFFSET = 100_000_000

# table -> int64 key columns to offset per replica
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["nation", "region"]


# --pair-budget replica offset for the documents table: doc_id // 10^9 is
# the raster SHARD term in the dhash near-dup fixture (multimodal.py), so
# a 10^9-per-replica offset gives every replica its own raster family —
# dup groups stay replica-local and the near-dup PAIR count grows
# ~linearly with data (the default 100M offset keeps shard = 0 everywhere,
# which is the deliberate cap-saturation stress; VERDICT r09 item 8).
PAIR_BUDGET_OFFSET = 1_000_000_000


def _replica(
    table: pa.Table, name: str, i: int, offset: int = OFFSET
) -> pa.Table:
    off = i * offset
    for col in KEYS[name]:
        idx = table.schema.get_field_index(col)
        table = table.set_column(
            idx, col, pc.add(table.column(col), pa.scalar(off, pa.int64()))
        )
    if name == "documents" and i > 0:
        idx = table.schema.get_field_index("text")
        text = pc.binary_join_element_wise(
            table.column("text").cast(pa.string()), f" repl{i}", ""
        )
        table = table.set_column(idx, "text", text)
        nidx = table.schema.get_field_index("n_chars")
        table = table.set_column(
            nidx,
            "n_chars",
            pc.add(
                table.column("n_chars"),
                pa.scalar(len(f" repl{i}"), pa.int64()),
            ),
        )
    if name == "embeddings" and i > 0:
        # nudge component 0 by a replica-specific epsilon: cosine
        # structure within a replica is preserved, exact cross-replica
        # vector duplicates are not. Nudge ONLY non-empty entries (an
        # empty list's start offset equals its successor's — nudging it
        # would hit the NEXT vector's component 0) and carry the null
        # mask through from_arrays so null embeddings stay null.
        emb = table.column("embedding").combine_chunks()
        values = emb.values.to_numpy(zero_copy_only=False).copy()
        offsets = emb.offsets.to_numpy(zero_copy_only=False)
        starts, ends = offsets[:-1], offsets[1:]
        nonempty = starts[starts < ends]
        values[nonempty] = values[nonempty] + (i * 1e-3)
        mask = emb.is_null() if emb.null_count else None
        nudged = pa.ListArray.from_arrays(
            emb.offsets, pa.array(values, type=pa.float32()), mask=mask
        )
        eidx = table.schema.get_field_index("embedding")
        table = table.set_column(
            eidx, "embedding", nudged.cast(table.schema.field("embedding").type)
        )
    return table


def main() -> None:
    flags = {"--pair-budget", "--sf10"}
    args = [a for a in sys.argv[1:] if a not in flags]
    pair_budget = "--pair-budget" in sys.argv[1:]
    # --sf10: the SECOND measured scale decade (VERDICT r10 item 4) —
    # 100 pair-budget replicas of the sf0.1 documents table, giving a
    # documents-only sf10-equivalent for the substring-dedup /
    # decontaminate / batch-BM25 slope rows (sf1pb -> sf10pb is a clean
    # 10x on the same construction, so the slope is data-growth only)
    sf10 = "--sf10" in sys.argv[1:]
    default = "sf10pb" if sf10 else ("sf1pb" if pair_budget else "sf1")
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scratch", default,
    )
    if pair_budget or sf10:
        # documents only: the pair-budgeted fixtures exist for the
        # documents-table slope rows (dhash near-dup, substring family)
        replicas = REPLICAS * 10 if sf10 else REPLICAS
        src = pq.read_table(f"{SRC}/documents.parquet")
        os.makedirs(f"{out}/documents.parquet", exist_ok=True)
        for i in range(replicas):
            pq.write_table(
                _replica(src, "documents", i, offset=PAIR_BUDGET_OFFSET),
                f"{out}/documents.parquet/part-{i}.parquet",
            )
        print(f"documents: {src.num_rows} x {replicas} rows "
              f"(pair-budget offsets) -> {out}")
        print("done:", out)
        return
    for name in COPY_ONCE:
        os.makedirs(f"{out}/{name}.parquet", exist_ok=True)
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{out}/{name}.parquet/part-0.parquet",
        )
    for name in KEYS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        os.makedirs(f"{out}/{name}.parquet", exist_ok=True)
        for i in range(REPLICAS):
            pq.write_table(
                _replica(src, name, i),
                f"{out}/{name}.parquet/part-{i}.parquet",
            )
        print(f"{name}: {src.num_rows} x {REPLICAS} rows -> {out}")
    print("done:", out)


if __name__ == "__main__":
    main()
