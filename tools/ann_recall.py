#!/usr/bin/env python
"""Generate ANN_RECALL_r{N}.json: measured recall@5 of every ANN path
(single-probe LSH, multiprobe LSH, IVF, flat-PQ ADC, fused IVF-PQ)
against the exact brute-force top-5, per query vector and as means, at
sf0.01 and sf0.1 — the audit artifact the index recommendation in
llm_sim_knn_lsh's docstring cites.

Usage: python tools/ann_recall.py [--out ANN_RECALL_r4.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _hnsw_search_numpy(V):
    """Numpy replica of llm_sim_knn_hnsw's build + beam search (same
    parameters, same (cosine desc, id asc) tie-breaks). Used twice:
    (a) on the REAL corpus, where its result set must agree with the
    Spark op (fidelity pin recorded in the artifact), and (b) on the
    ANISOTROPIC TWIN corpus llm_embed_opq constructs (r15 — VERDICT r14
    item 5a: recall 1.00 on the near-isotropic fixture is the easy
    case; this row measures the graph index where PQ/LSH degrade).
    Returns (result_set, exact_set) of (qid, vec_id) top-5 pairs."""
    import math

    import numpy as np

    V = np.asarray(V, dtype=np.float64)
    n = len(V)
    cells = math.isqrt(n)
    cells += cells * cells < n
    M, CAP, BEAM, ROUNDS, ENTRIES = 8, 16, 8, 3, 4
    nrm = np.linalg.norm(V, axis=1)
    nrm = np.where(nrm == 0, 1.0, nrm)
    U = V / nrm[:, None]

    def topk(scores, ids, k):
        # (score desc, id asc); lexsort's LAST key is primary
        order = np.lexsort((ids, -scores))
        return [int(ids[i]) for i in order[:k]]

    ccos = U @ U[:cells].T
    top2 = [topk(ccos[i], np.arange(cells), 2) for i in range(n)]
    assign = np.array([t[0] for t in top2])
    members = {}
    for i, a in enumerate(assign):
        members.setdefault(int(a), []).append(i)
    adj = {}
    for src in range(n):
        cand = [x for cell in top2[src] for x in members.get(cell, [])
                if x != src]
        cand = np.array(sorted(set(cand)), dtype=int)
        if not len(cand):
            adj[src] = []
            continue
        adj[src] = topk(U[cand] @ U[src], cand, M)
    sym = {s: set(d) for s, d in adj.items()}
    for s, ds in adj.items():
        for d in ds:
            sym.setdefault(d, set()).add(s)
    edges = {}
    for s, ds in sym.items():
        ds = np.array(sorted(ds), dtype=int)
        edges[s] = topk(U[ds] @ U[s], ds, CAP) if len(ds) else []
    result, exact = set(), set()
    for qid in range(min(10, n)):
        scores = U @ U[qid]
        others = np.array([i for i in range(n) if i != qid])
        for v in topk(scores[others], others, 5):
            exact.add((qid, v))
        visited = {int(c): float(scores[c]) for c in
                   topk(scores[:cells], np.arange(cells), ENTRIES)}
        for _ in range(ROUNDS):
            vid = np.array(sorted(visited), dtype=int)
            vsc = np.array([visited[i] for i in vid])
            beam = topk(vsc, vid, BEAM)
            new = {d for b in beam for d in edges.get(b, [])} - set(visited)
            for d in new:
                visited[int(d)] = float(scores[d])
        vid = np.array([i for i in sorted(visited) if i != qid], dtype=int)
        vsc = np.array([visited[i] for i in vid])
        for v in topk(vsc, vid, 5):
            result.add((qid, v))
    return result, exact


def _aniso_twin(emb):
    """The deterministic anisotropic twin corpus from llm_embed_opq's
    _aniso_kernel: half-away-quantized micro-units, per-dim geometric
    rescale, Sylvester-Hadamard mix, // 262144."""
    import numpy as np

    x = np.asarray(emb, dtype=np.float64) * 1000000.0
    V = np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)).astype(
        np.int64
    )
    H = np.array([[1]], dtype=np.int64)
    while H.shape[0] < 64:
        H = np.block([[H, H], [H, -H]])
    sdiag = np.maximum(4 ** np.maximum(6 - np.arange(64), 0), 1)
    A = (V * sdiag[None, :]) @ H
    return (np.sign(A) * (np.abs(A) // 262144)).astype(np.float64)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "ANN_RECALL_r4.json"))
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from hdfs_mr_spark.operators.llm_similarity import _ann_params
    from hdfs_mr_spark.registry import all_specs
    from hdfs_mr_spark.session import get_spark

    spark = get_spark("ann-recall")
    qs = all_specs()
    out = {}
    for sf in ("0.01", "0.1"):
        path = f"/root/testdata/sf{sf}"
        audit = [r.asDict() for r in qs["llm_ann_recall_audit"].fn(spark, path).collect()]
        exact = {(r.qid, r.vec_id) for r in qs["llm_sim_knn"].fn(spark, path).collect()}
        mp = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_lsh_multiprobe"].fn(spark, path).collect()
        }
        mt = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_lsh_multitable"].fn(spark, path).collect()
        }
        adc = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_pq_adc"].fn(spark, path).collect()
        }
        ivfpq = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_pq"].fn(spark, path).collect()
        }
        rerank = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_pq_rerank"].fn(spark, path).collect()
        }
        # stored/delta indexes are exact-IVF by construction; measuring
        # them here is the standing self-audit that the persisted +
        # incrementally-maintained layouts keep IVF's recall
        stored = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_stored"].fn(spark, path).collect()
        }
        delta = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_delta"].fn(spark, path).collect()
        }
        # r8: the persisted / frozen-codebook-absorbed PQ layouts — the
        # standing audit that storing and delta-absorbing codes keeps
        # the in-flight composite's recall (stored is bit-identical by
        # construction; delta pays the frozen-codebook cost, measured)
        pq_stored = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_pq_stored"].fn(spark, path).collect()
        }
        pq_delta = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_pq_delta"].fn(spark, path).collect()
        }
        # r11: compaction folds the absorbed delta into a full-corpus
        # re-train — the artifact must show delta -> compacted recall
        # recovery to at least the stored level (VERDICT r10 item 7)
        pq_compact = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_ivf_pq_compact"].fn(spark, path).collect()
        }
        # r14: graph-navigable ANN (HNSW class) — beam search over the
        # stored bounded-degree neighbor graph
        hnsw = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_hnsw"].fn(spark, path).collect()
        }
        # r15: graph maintained by the bounded delta absorb (base-split
        # build + batch re-link) — the standing audit that absorbing
        # keeps the graph navigable to the NEW vectors too
        hnsw_delta = {
            (r.qid, r.vec_id)
            for r in qs["llm_sim_knn_hnsw_delta"].fn(spark, path).collect()
        }
        # r15 (VERDICT r14 item 5a): HNSW under anisotropy — numpy
        # replica of the same build+search on llm_embed_opq's
        # deterministic anisotropic twin; the replica's fidelity is
        # pinned by running it on the REAL corpus and requiring exact
        # agreement with the Spark op's result set
        emb_tbl = pq.read_table(f"{path}/embeddings.parquet")
        import numpy as _np

        emb = _np.stack(
            emb_tbl.sort_by("vec_id").column("embedding").to_pylist()
        )
        np_real, np_exact = _hnsw_search_numpy(emb)
        replica_agrees = np_real == hnsw
        aniso_res, aniso_exact = _hnsw_search_numpy(_aniso_twin(emb))
        n = pq.ParquetFile(f"{path}/embeddings.parquet").metadata.num_rows
        cells, nprobe, bits = _ann_params(n)
        out[f"sf{sf}"] = {
            "per_query": audit,
            "mean_ivf_recall_at_5": sum(r["ivf_recall_at_5"] for r in audit) / len(audit),
            "mean_lsh_recall_at_5": sum(r["lsh_recall_at_5"] for r in audit) / len(audit),
            "mean_lsh_multiprobe_recall_at_5": len(exact & mp) / len(exact),
            "mean_lsh_multitable_recall_at_5": len(exact & mt) / len(exact),
            "mean_pq_adc_recall_at_5": len(exact & adc) / len(exact),
            "mean_ivf_pq_recall_at_5": len(exact & ivfpq) / len(exact),
            "mean_ivf_pq_rerank_recall_at_5": len(exact & rerank) / len(exact),
            "mean_ivf_stored_recall_at_5": len(exact & stored) / len(exact),
            "mean_ivf_delta_recall_at_5": len(exact & delta) / len(exact),
            "mean_ivf_pq_stored_recall_at_5": len(exact & pq_stored) / len(exact),
            "mean_ivf_pq_delta_recall_at_5": len(exact & pq_delta) / len(exact),
            "mean_ivf_pq_compact_recall_at_5": len(exact & pq_compact) / len(exact),
            "mean_hnsw_recall_at_5": len(exact & hnsw) / len(exact),
            "mean_hnsw_delta_recall_at_5": len(exact & hnsw_delta) / len(exact),
            "hnsw_numpy_replica_agrees": bool(replica_agrees),
            "mean_hnsw_aniso_recall_at_5": len(aniso_exact & aniso_res) / len(aniso_exact),
            "params": {"n": n, "ivf_cells": cells, "ivf_nprobe": nprobe, "lsh_bits": bits},
        }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")
    for sf, rec in out.items():
        print(sf, {k: round(v, 3) for k, v in rec.items() if k.startswith("mean")})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
