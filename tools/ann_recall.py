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
            "params": {"n": n, "ivf_cells": cells, "ivf_nprobe": nprobe, "lsh_bits": bits},
        }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")
    for sf, rec in out.items():
        print(sf, {k: round(v, 3) for k, v in rec.items() if k.startswith("mean")})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
