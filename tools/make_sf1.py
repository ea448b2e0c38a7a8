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
    table: pa.Table, name: str, i: int, offset: int = OFFSET,
    doc_variant: str = "suffix",
) -> pa.Table:
    off = i * offset
    for col in KEYS[name]:
        idx = table.schema.get_field_index(col)
        table = table.set_column(
            idx, col, pc.add(table.column(col), pa.scalar(off, pa.int64()))
        )
    if name == "documents" and doc_variant == "exact":
        # exact-duplicate replicas: text byte-identical across replicas,
        # only keys offset — the high-multiplicity adversarial shape for
        # set-similarity self-joins (every replica group IS one exact
        # duplicate group of size = replica count)
        return table
    if name == "documents" and doc_variant == "word-tagged" and i > 0:
        # word-level replica tagging: prefix EVERY word with r{i}, so
        # every shingle string is replica-unique — cross-replica Jaccard
        # is exactly 0 and near-dup families stay replica-local. This is
        # the bounded-family instrument: 10x replicas = 10x data AND
        # ~10x output (vs the suffix variant, where one trailing token
        # leaves cross-replica Jaccard ~0.98 and the reported PAIR set
        # itself grows quadratically in replica count).
        idx = table.schema.get_field_index("text")
        text = table.column("text").cast(pa.string())
        tagged = pc.replace_substring_regex(
            text, pattern=r"(\S+)", replacement=rf"r{i}\1"
        )
        table = table.set_column(idx, "text", tagged)
        # n_chars drifts from len(text) here; no slope query reads it
        return table
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
    flags = {"--pair-budget", "--sf10", "--emb", "--word-tagged", "--exact"}
    args = [a for a in sys.argv[1:] if a not in flags]
    pair_budget = "--pair-budget" in sys.argv[1:]
    # --word-tagged / --exact: documents-only variants of the pair-budget
    # construction for the PPJoin second decade (VERDICT r11 items 4/5):
    # word-tagged keeps near-dup families replica-local (bounded output —
    # a clean 10x-data slope instrument); exact makes replicas byte-
    # identical (maximal duplicate multiplicity — the adversarial shape
    # for the distinct-token-set collapse disposition test).
    word_tagged = "--word-tagged" in sys.argv[1:]
    exact = "--exact" in sys.argv[1:]
    # --replicas=N: override the replica count (intermediate scale points
    # for slope curves, e.g. a 30-replica exact fixture to measure the
    # id-level candidate blowup before it exhausts local disk)
    replicas_override = None
    for a in list(args):
        if a.startswith("--replicas="):
            replicas_override = int(a.split("=", 1)[1])
            args.remove(a)
    # --sf10: the SECOND measured scale decade (VERDICT r10 item 4) —
    # 100 pair-budget replicas of the sf0.1 documents table, giving a
    # documents-only sf10-equivalent for the substring-dedup /
    # decontaminate / batch-BM25 slope rows (sf1pb -> sf10pb is a clean
    # 10x on the same construction, so the slope is data-growth only)
    sf10 = "--sf10" in sys.argv[1:]
    # --emb: embeddings-only fixture for the ANN (IVF/PQ) slope rows —
    # the full sf1 fixture already carries 10x embeddings, but the
    # second decade (VERDICT r11 item 4) needs a 100x embeddings table
    # without paying for 100x lineitem. Same per-replica construction
    # as the full fixture (vec_id offsets + component-0 nudge), so
    # sf1emb -> sf10emb isolates data growth.
    emb = "--emb" in sys.argv[1:]
    if word_tagged:
        default = "sf10wt" if sf10 else "sf1wt"
    elif exact:
        default = "sf10ex" if sf10 else "sf1ex"
    elif emb:
        default = "sf10emb" if sf10 else "sf1emb"
    else:
        default = "sf10pb" if sf10 else ("sf1pb" if pair_budget else "sf1")
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scratch", default,
    )
    if emb:
        replicas = replicas_override or (REPLICAS * 10 if sf10 else REPLICAS)
        src = pq.read_table(f"{SRC}/embeddings.parquet")
        os.makedirs(f"{out}/embeddings.parquet", exist_ok=True)
        for i in range(replicas):
            pq.write_table(
                _replica(src, "embeddings", i),
                f"{out}/embeddings.parquet/part-{i}.parquet",
            )
        print(f"embeddings: {src.num_rows} x {replicas} rows -> {out}")
        print("done:", out)
        return
    if pair_budget or sf10 or word_tagged or exact:
        # documents only: the pair-budgeted fixtures exist for the
        # documents-table slope rows (dhash near-dup, substring family)
        variant = (
            "word-tagged" if word_tagged else ("exact" if exact else "suffix")
        )
        replicas = replicas_override or (REPLICAS * 10 if sf10 else REPLICAS)
        src = pq.read_table(f"{SRC}/documents.parquet")
        os.makedirs(f"{out}/documents.parquet", exist_ok=True)
        for i in range(replicas):
            pq.write_table(
                _replica(
                    src, "documents", i, offset=PAIR_BUDGET_OFFSET,
                    doc_variant=variant,
                ),
                f"{out}/documents.parquet/part-{i}.parquet",
            )
        print(f"documents: {src.num_rows} x {replicas} rows "
              f"({variant} pair-budget offsets) -> {out}")
        print("done:", out)
        return
    for name in COPY_ONCE:
        os.makedirs(f"{out}/{name}.parquet", exist_ok=True)
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{out}/{name}.parquet/part-0.parquet",
        )
    replicas = replicas_override or REPLICAS
    for name in KEYS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        os.makedirs(f"{out}/{name}.parquet", exist_ok=True)
        for i in range(replicas):
            pq.write_table(
                _replica(src, name, i),
                f"{out}/{name}.parquet/part-{i}.parquet",
            )
        print(f"{name}: {src.num_rows} x {replicas} rows -> {out}")
    print("done:", out)


if __name__ == "__main__":
    main()
