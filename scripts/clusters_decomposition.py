"""Decompose the dedup_clusters pipeline-stage time at a replicated scale
(VERDICT r07 item 8): the stage is candidate DERIVATION (tokenize →
shingle → minhash → band → bucket join; corpus-linear) plus the
connected-components LOOP (edge-set-sized, diameter-bounded). The 100x
pipeline table shows 14.7x for the whole stage — this script measures the
two halves separately to show the ratio lives in the linear derivation
(it tracks dedup_minhash_sigs' own 100x ratio) while the loop stays
near-constant.

    python scripts/clusters_decomposition.py [--mult 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    args = ap.parse_args()

    import scale_probe
    from hive_server_spark.session import get_spark

    spark = get_spark("clusters-decomposition")
    spark.sparkContext.setLogLevel("ERROR")

    from hive_server_spark.plans import text_pack

    def decompose(sf_dir: str) -> tuple[float, float, int]:
        t0 = time.perf_counter()
        cands = text_pack._minhash_candidates(spark, sf_dir)
        n_edges = cands.count()  # materializes the persisted candidate set
        t_derive = time.perf_counter() - t0
        t0 = time.perf_counter()
        text_pack._dup_clusters(spark, sf_dir).count()
        t_loop = time.perf_counter() - t0
        return t_derive, t_loop, n_edges

    d1, l1, e1 = decompose(scale_probe.BASE_DIR)

    scaled = os.path.join(tempfile.mkdtemp(prefix="hss_cdec_"), f"x{args.mult}")
    os.makedirs(scaled, exist_ok=True)
    print(f"building {args.mult}x corpus at {scaled} ...", flush=True)
    scale_probe.build_scaled_dir(spark, scaled, args.mult)
    dM, lM, eM = decompose(scaled)

    print(f"candidate pairs: 1x={e1}  {args.mult}x={eM}  ({eM / max(e1,1):.1f}x)")
    print(
        f"derivation: 1x={d1:.2f}s  {args.mult}x={dM:.2f}s  ({dM / d1:.1f}x)\n"
        f"components loop: 1x={l1:.2f}s  {args.mult}x={lM:.2f}s  ({lM / l1:.1f}x)"
    )


if __name__ == "__main__":
    main()
