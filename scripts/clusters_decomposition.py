"""Decompose the dedup_clusters pipeline-stage time at a replicated scale
(VERDICT r07 item 8): the stage is candidate DERIVATION (tokenize →
shingle → minhash → band → bucket join; corpus-linear) plus the
connected-components LOOP (edge-set-sized, diameter-bounded). The 100x
pipeline table shows 14.7x for the whole stage — this script measures the
two halves separately to show the ratio lives in the linear derivation
(it tracks dedup_minhash_sigs' own 100x ratio) while the loop stays
near-constant.

    python scripts/clusters_decomposition.py [--mult 100]

--clean (round 9, VERDICT r8 item 5) measures the TRUE operator ratio on
a non-self-similar corpus: the r8 decomposition proved that under ANY
replication of the standard probe corpus, cross-base near-dup pairs
(A_i ~ B_j for genuinely similar base docs A, B) replicate ~C(mult, 2) —
a property of the replicated corpus, not the operator — so the measured
14x at 100x was only an upper bound. Clean mode suffixes EVERY token
with a per-copy marker: an isomorphic token mapping per copy, so each
copy keeps the base corpus's own near-dup cluster structure EXACTLY
(planted clusters survive) while every shingle becomes copy-specific —
cross-copy candidate pairs vanish and the edge set is linear in mult by
construction (the shape a real non-replicated 100 TB corpus has). The 1x
baseline gets the same suffix (copy 0) so per-row work is comparable.

    python scripts/clusters_decomposition.py --mult 100 --clean
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


def build_clean_dirs(spark, mult: int) -> tuple[str, str]:
    """1x and mult-x document dirs under the per-copy token-suffix
    perturbation (see module docstring): isomorphic within each copy,
    zero cross-copy shingle overlap."""
    import scale_probe
    from pyspark.sql import functions as F

    from hive_server_spark.catalog import load_table

    base = load_table(spark, scale_probe.BASE_DIR, "documents")
    stride = scale_probe._strides(spark)["documents"]

    def suffixed(df, i: int):
        return df.withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), t -> concat(t, '_c{i}')), ' ')"
            ),
        )

    root = tempfile.mkdtemp(prefix="hss_cdec_clean_")
    one = os.path.join(root, "x1")
    big = os.path.join(root, f"x{mult}")
    os.makedirs(one)
    os.makedirs(big)
    suffixed(base, 0).write.parquet(os.path.join(one, "documents.parquet"))
    copies = [
        suffixed(base.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride)), i)
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.parquet(os.path.join(big, "documents.parquet"))
    return one, big


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--clean", action="store_true",
                    help="non-self-similar corpus: per-copy token suffix, "
                         "linear edge set by construction")
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

    if args.clean:
        print(f"building clean 1x + {args.mult}x corpora ...", flush=True)
        one, big = build_clean_dirs(spark, args.mult)
        d1, l1, e1 = decompose(one)
        dM, lM, eM = decompose(big)
    else:
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
