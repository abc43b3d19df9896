"""Per-partition CSR adjacency blocks via Arrow ``applyInPandas``.

The reference re-encodes the graph into SCOTCH's compressed-sparse-row
arrays before every heavy kernel call — ``verttab`` (offsets), ``edgetab``
(neighbor ids), ``edlotab`` (edge weights), ``velotab`` (vertex weights)
(/root/reference/graph_partitioning/partitioners/scotch/scotch_data.py:11-17,
115-158). This module is that encoding distributed: one CSR block per
FENNEL partition, built inside an Arrow batch by ``applyInPandas`` (NumPy
only — no per-row Python), so algorithm inner loops that are faster
vectorized than as raw shuffles (local vote accumulation, block-local
degree/PageRank kernels) can run on the block while cross-partition
traffic stays in DataFrame land.

Block layout per partition (ids sorted ascending, matching
``scotch_data.py:116``'s sorted node order):
  vertex_ids[i]   — global id of local vertex i
  indptr[i]..indptr[i+1] — slice of ``indices`` holding i's neighbors
  indices[j]      — *local* index of the neighbor if intra-partition,
                    else ``-(global_id)-1`` (cut edge, encoded negative)
  edge_weights[j] — weight of that edge
  vertex_weights[i] — node weight (1.0 default)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.edges import symmetrize

CSR_SCHEMA = (
    "partition int, n_vertices long, n_edges long, "
    "vertex_ids array<long>, indptr array<long>, indices array<long>, "
    "edge_weights array<double>, vertex_weights array<double>"
)


def build_csr_blocks(
    edges: DataFrame,
    assignments: DataFrame,
    vertices: DataFrame | None = None,
    keep_cut_edges: bool = True,
) -> DataFrame:
    """One CSR block row per partition.

    ``edges``: canonical undirected (src < dst, weight).
    ``assignments``: (id, partition ≥ 0).
    ``vertices``: optional (id, weight).

    Plan: symmetrize → attach src's partition → group all of a partition's
    adjacency rows into one Arrow batch → NumPy CSR build. The shuffle is
    one hash partition by ``partition`` — the same co-location the
    partitioner optimized for, so at scale each block holds mostly
    intra-partition edges (that being the point of FENNEL).
    """
    a_src = assignments.select(F.col("id").alias("src"), F.col("partition"))
    a_dst = assignments.select(F.col("id").alias("dst"), F.col("partition").alias("p_dst"))
    adj = (
        symmetrize(edges)
        .join(a_src, "src")
        .join(a_dst, "dst")
        .select("partition", "src", "dst", "weight", (F.col("p_dst") == F.col("partition")).alias("intra"))
    )
    if not keep_cut_edges:
        adj = adj.filter(F.col("intra"))
    if vertices is not None:
        vw = vertices.select(F.col("id").alias("src"), F.col("weight").alias("vweight"))
        adj = adj.join(vw, "src", "left")
    else:
        adj = adj.withColumn("vweight", F.lit(1.0))
    # nodes with no surviving adjacency rows still belong in the block
    solo = assignments.select(
        "partition", F.col("id").alias("src"),
        F.lit(None).cast("long").alias("dst"),
        F.lit(None).cast("double").alias("weight"),
        F.lit(True).alias("intra"),
    )
    if vertices is not None:
        solo = solo.join(vw, "src", "left")
    else:
        solo = solo.withColumn("vweight", F.lit(1.0))
    adj = adj.unionByName(solo)
    # canonical (partition, src, dst) order produced BY THE SHUFFLE: the
    # repartition below is the exact distribution applyInPandas requires
    # (so no second exchange), and sortWithinPartitions satisfies the
    # group-sort as a prefix (so no second sort) while additionally
    # ordering each group's rows by (src, dst) — Tungsten's spillable
    # sort-merge does the work JVM-side. The per-block NumPy canonical
    # sort (the kernel's former dominant cost, ~2.8s per 10M-edge block)
    # then degenerates to an O(E) monotonicity check.
    adj = adj.repartition("partition").sortWithinPartitions("partition", "src", "dst")

    def to_csr(key, pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        real = pdf[pdf["dst"].notna()]
        # unique vertex ids WITHOUT re-sorting: the shuffle already ordered
        # rows by (src, dst), so uniques are just the group boundaries —
        # np.unique's O(E log E) sort is the fallback for unsorted input
        all_src = pdf["src"].to_numpy(dtype=np.int64)
        if len(all_src) > 1 and bool((all_src[1:] >= all_src[:-1]).all()):
            nb = np.empty(len(all_src), dtype=bool)
            nb[0] = True
            nb[1:] = all_src[1:] != all_src[:-1]
            ids = all_src[nb]
        else:
            ids = np.unique(all_src)
        n = len(ids)
        src = real["src"].to_numpy(dtype=np.int64)
        dst = real["dst"].to_numpy(dtype=np.int64)
        w = real["weight"].to_numpy(dtype=np.float64)
        intra = real["intra"].to_numpy(dtype=bool)
        # verify the shuffle-produced canonical (src, dst) order; sort only
        # if some upstream rewrite broke it (defensive — the slow path keeps
        # the kernel correct on arbitrary input, e.g. direct unit-test calls)
        if len(src) > 1:
            asc = (src[1:] > src[:-1]) | (
                (src[1:] == src[:-1]) & (dst[1:] >= dst[:-1])
            )
            presorted = bool(asc.all())
        else:
            presorted = True
        if not presorted:
            # composite-key argsort when both id columns fit in 32 bits
            # (3x faster than lexsort); lexsort otherwise (virtual nodes
            # use negative ids, web-scale external ids may exceed 2^31)
            if len(src) and (
                src.min() >= 0
                and dst.min() >= 0
                and max(int(src.max()), int(dst.max())) < (1 << 31)
            ):
                order = np.argsort((src << np.int64(32)) | dst, kind="stable")
            else:
                order = np.lexsort((dst, src))
            src, dst, w, intra = src[order], dst[order], w[order], intra[order]
        # indptr by probing each vertex's block start in the SORTED src
        # column — n probes instead of E (the E-side searchsorted +
        # histogram a naive relabel pays); vertices without edges get
        # zero-length blocks automatically
        indptr = np.concatenate(
            [np.searchsorted(src, ids, side="left"), [len(src)]]
        )
        # dst → local index, cheapest applicable scheme first:
        #   identity (contiguous id block: local = id − base, no gather),
        #   arithmetic progression (modular assignments id ≡ p (mod k):
        #   local = (id − base)/stride, pure arithmetic),
        #   LUT gather (dense-ish span), binary search (sparse span).
        # The first two avoid the 10M-random-access LUT gather that
        # dominated the presorted kernel (~3s of 6.4s per 10M-edge block).
        if n:
            span = int(ids[-1] - ids[0]) + 1
            stride = int(ids[1] - ids[0]) if n > 1 else 1
            off = dst - ids[0]
            if span == n:
                inb = (off >= 0) & (off < n)
                dst_local = np.where(inb, off, -1)
            elif (
                n > 1
                and stride > 0
                and span == (n - 1) * stride + 1
                and bool((np.diff(ids) == stride).all())
            ):
                q, r = np.divmod(off, stride)
                inb = (off >= 0) & (off < span) & (r == 0)
                dst_local = np.where(inb, q, -1)
            elif span <= max(4 * n, 1 << 20):
                lut = np.full(span, -1, dtype=np.int64)
                lut[ids - ids[0]] = np.arange(n, dtype=np.int64)
                inb = (off >= 0) & (off < span)
                dst_local = np.where(inb, lut[np.clip(off, 0, span - 1)], -1)
            else:
                dst_idx = np.minimum(np.searchsorted(ids, dst), n - 1)
                dst_local = np.where(ids[dst_idx] == dst, dst_idx, -1)
        else:
            dst_local = np.full(len(dst), -1, dtype=np.int64)
        indices = np.where(intra, dst_local, -dst - 1)
        # first non-null vweight per vertex, without the pandas
        # drop_duplicates pass (10s per 10M-edge block): reversed fancy
        # assignment makes the FIRST occurrence the surviving write
        vweights = np.ones(n, dtype=np.float64)
        all_vw = pdf["vweight"].to_numpy(dtype=np.float64)
        valid = ~np.isnan(all_vw)
        if valid.any():
            v_pos = np.searchsorted(
                ids, pdf["src"].to_numpy(dtype=np.int64)[valid]
            )
            vweights[v_pos[::-1]] = all_vw[valid][::-1]
        # hand Arrow the ndarrays directly — pyarrow ingests a numpy array
        # ~25x faster than a Python list of the same 10M elements
        return pd.DataFrame(
            {
                "partition": [part],
                "n_vertices": [n],
                "n_edges": [len(src)],
                "vertex_ids": [ids],
                "indptr": [indptr],
                "indices": [indices],
                "edge_weights": [w],
                "vertex_weights": [vweights],
            }
        )

    return adj.groupBy("partition").applyInPandas(to_csr, schema=CSR_SCHEMA)


def csr_degrees(blocks: DataFrame) -> DataFrame:
    """(id, degree) recovered from CSR blocks — the round-trip check kernel.

    Runs as a vectorized mapInPandas over block rows (NumPy diff of indptr).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # iterrows is safe ONLY because each row is a whole per-partition
            # CSR block (k rows total, each carrying arrays of the real
            # data) — the Python loop is O(num_partitions), never O(edges)
            for _, row in pdf.iterrows():
                ids = np.asarray(row["vertex_ids"], dtype=np.int64)
                indptr = np.asarray(row["indptr"], dtype=np.int64)
                yield pd.DataFrame({"id": ids, "degree": np.diff(indptr)})

    return blocks.mapInPandas(run, schema="id long, degree long")


def local_label_propagation(blocks: DataFrame, max_iter: int = 10) -> DataFrame:
    """Synchronous LPA over the INTRA-partition edges of each CSR block —
    the "algorithm inner loop vectorized on the block" execution style the
    north star asks for (SURVEY.md §2.7): the whole per-partition iteration
    runs inside one Arrow call on NumPy arrays, no per-superstep shuffle;
    cut edges (negative ``indices``) are boundary traffic by construction
    and excluded, so communities never span partitions — exactly the
    community-detection step `partition_community_quality` needs.

    Semantics match `graph.labelprop.label_propagation` restricted to the
    intra edge set bit-for-bit: labels init to vertex ids, each iteration
    every node with ≥1 intra neighbor adopts the label with max summed
    edge weight (ties → smallest label), others keep; fixed iteration
    count with early stop at a fixed point.

    Returns (id, label).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # O(num_partitions) rows; each row is a whole CSR block
            for _, row in pdf.iterrows():
                ids = np.asarray(row["vertex_ids"], dtype=np.int64)
                indptr = np.asarray(row["indptr"], dtype=np.int64)
                indices = np.asarray(row["indices"], dtype=np.int64)
                w_all = np.asarray(row["edge_weights"], dtype=np.float64)
                n = len(ids)
                if n == 0:
                    continue
                owner = np.repeat(np.arange(n), np.diff(indptr))
                intra = indices >= 0
                o = owner[intra]
                nb = indices[intra]
                w = w_all[intra]
                labels = ids.copy()
                for _ in range(max_iter):
                    if not len(o):
                        break
                    lbl = labels[nb]
                    # sum weights per (owner, label): sort + reduceat
                    order = np.lexsort((lbl, o))
                    o_s, l_s, w_s = o[order], lbl[order], w[order]
                    b = np.empty(len(o_s), dtype=bool)
                    b[0] = True
                    b[1:] = (o_s[1:] != o_s[:-1]) | (l_s[1:] != l_s[:-1])
                    starts = np.flatnonzero(b)
                    sums = np.add.reduceat(w_s, starts)
                    go, gl = o_s[starts], l_s[starts]
                    # per owner: (votes DESC, label ASC) first row wins
                    sel = np.lexsort((gl, -sums, go))
                    go2 = go[sel]
                    first = np.empty(len(go2), dtype=bool)
                    first[0] = True
                    first[1:] = go2[1:] != go2[:-1]
                    new_labels = labels.copy()
                    new_labels[go2[first]] = gl[sel][first]
                    if np.array_equal(new_labels, labels):
                        break
                    labels = new_labels
                yield pd.DataFrame({"id": ids, "label": labels})

    return blocks.mapInPandas(run, schema="id long, label long")


def local_votes(blocks: DataFrame, assignments: DataFrame, num_partitions: int) -> DataFrame:
    """Per-node FENNEL vote mass computed *inside* each CSR block (A3/J1 as
    a NumPy kernel) for intra-partition neighbors; cut-edge votes are
    emitted as (id, partition, votes) rows for the cross-block join.

    Demonstrates the reference's CSR-kernel execution style
    (fennel.pyx:19-38 over scotch_data arrays) on Arrow blocks. Intra votes
    need no neighbor lookup at all: every intra neighbor shares the block's
    partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids = np.asarray(row["vertex_ids"], dtype=np.int64)
                indptr = np.asarray(row["indptr"], dtype=np.int64)
                indices = np.asarray(row["indices"], dtype=np.int64)
                w = np.asarray(row["edge_weights"], dtype=np.float64)
                part = int(row["partition"])
                n = len(ids)
                if len(indices):
                    w_coerced = np.where(w <= 0.0, 1.0, w)
                    intra_mask = indices >= 0
                    owner = np.repeat(np.arange(n), np.diff(indptr))
                    intra_votes = np.zeros(n)
                    np.add.at(intra_votes, owner[intra_mask], w_coerced[intra_mask])
                else:
                    intra_votes = np.zeros(n)
                yield pd.DataFrame(
                    {"id": ids, "partition": part, "votes": intra_votes}
                )[lambda d: d["votes"] > 0]

    return blocks.mapInPandas(run, schema="id long, partition int, votes double")
