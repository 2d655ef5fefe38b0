#!/usr/bin/env python
"""PQ ADC-scan shuffle constancy: MEASURED shuffle-write bytes of the
post-encoding scan vs corpus size — the claim the round-8 wide-code
rewrite made ("zero corpus shuffle after code assignment",
pipeline/pq.py) turned into a curve with a hard gate, the same
promotion the sketch family got in tools/sketch_scaling.py.

Why this boundary: the r8 measurement program falsified the previous
ADC shape — the (sub, code) equi-join materialized n·q·S rows and
shuffled them through a (q, vec) aggregate, measuring SLOWER than
exact brute force at 1 M vectors (81.9 s vs 64.4 s). The wide-code
scan's only shuffle is the WindowGroupLimit's partial top-k stream
(tasks × queries × topk rows — independent of corpus size); a plan
regression that re-introduces a corpus-sized exchange above the codes
frame shows up here as scan-shuffle growing with the corpus.

Method: amplify the corpus (ann_crossover's near-dup replica
amplifier), train + encode UNTIMED (pq_train_encode), persist and
count codes_wide and qwide so the measured job reads cached codes,
then measure the pq_adc_scan job's shuffle-write bytes via the UI
REST stage metrics (sketch_scaling's harness).

Gates (exit 1 on violation):
  1. constancy — scan shuffle bytes at the largest factor within 3x
     of the smallest factor's, while the corpus grows factor-max/min;
  2. corpus-independence — scan shuffle at the largest factor under
     25 % of the encoded-corpus byte size n·(8 + 4·S) (a corpus-sized
     exchange would be >= 100 %);
  3. row contract — the scan returns exactly n_queries · topk rows;
  4. train+encode shuffle (r9 kernel rewrite) — the whole training
     pipeline's shuffle bytes are constant over corpus growth (<= 3x)
     and under 1 % of the raw vector bytes: assignment and encode are
     maps, the refit moves <= S·k·dim partial rows per task, so a
     corpus-sized exchange reappearing anywhere in train/encode trips
     this gate.

Usage: python tools/pq_scaling.py [sf_dir] [--factors 64,512]
                                  [--queries 128] [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nebula_storage_spark.cache import release_all
from nebula_storage_spark.graph import read_parquet
from nebula_storage_spark.pipeline.pq import pq_adc_scan, pq_train_encode

# reuse the crossover tool's amplifier + REST harness (same session
# config with the stage-metrics endpoint on)
from ann_crossover import amplify                              # noqa: E402
from sketch_scaling import get_spark_with_ui, measured         # noqa: E402

SUBSPACES = 4
K = 4
TOPK = 10


def main() -> int:
    args = list(sys.argv[1:])
    factors = [64, 512]
    nq = 128
    reps = 2
    if "--factors" in args:
        i = args.index("--factors")
        factors = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--queries" in args:
        i = args.index("--queries")
        nq = int(args[i + 1])
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    emb = read_parquet(spark, os.path.join(sf, "embeddings.parquet"))
    cells = []
    violated = False
    for factor in sorted(factors):
        corpus = amplify(emb, factor).repartition(32).persist()
        n = corpus.count()

        # train + encode, measured for SHUFFLE as well as wall (r9
        # kernel rewrite claim: assignment and encode are maps, the
        # refit shuffle is codebook-sized — so the whole train+encode
        # pipeline's shuffle bytes must be corpus-independent, tiny
        # vs the raw vector bytes n·dim·8).
        def build():
            cw, qw = pq_train_encode(
                corpus, n_queries=nq, subspaces=SUBSPACES, k=K,
                iterations=2)
            cw = cw.persist()
            cw.count()                           # encode untimed
            qw = qw.persist()
            qw.count()
            return cw, qw
        encode_sec, train_sw, (codes_wide, qwide) = measured(app_id, build)
        # warmup scan (codegen), untimed
        pq_adc_scan(codes_wide, qwide, subspaces=SUBSPACES, topk=TOPK).count()
        best_t = best_b = rows = None
        for _ in range(max(1, reps)):
            dt, sw, r = measured(
                app_id,
                lambda: pq_adc_scan(codes_wide, qwide, subspaces=SUBSPACES,
                                    topk=TOPK).count())
            best_t = dt if best_t is None else min(best_t, dt)
            best_b = sw if best_b is None else min(best_b, sw)
            rows = r
        ok_rows = rows == nq * TOPK
        cell = {"op": "pq_adc_scan", "factor": factor, "n_vectors": n,
                "n_queries": nq,
                "encode_sec": round(encode_sec, 3),
                "train_shuffle_kb": round(train_sw / 1024, 1),
                "scan_sec": round(best_t, 3),
                "scan_shuffle_kb": round(best_b / 1024, 1),
                "rows": rows, "ok_rows": ok_rows}
        violated = violated or not ok_rows
        cells.append(cell)
        print(json.dumps(cell), flush=True)
        codes_wide.unpersist()
        qwide.unpersist()
        corpus.unpersist()
        release_all()                            # pq pins pts + cent
        spark.catalog.clearCache()

    if len(cells) >= 2:
        lo, hi = cells[0], cells[-1]
        growth = hi["scan_shuffle_kb"] / max(lo["scan_shuffle_kb"], 1.0)
        corpus_kb = hi["n_vectors"] * (8 + 4 * SUBSPACES) / 1024
        frac = hi["scan_shuffle_kb"] / corpus_kb
        ok_const = growth <= 3.0
        ok_indep = frac <= 0.25
        gate = {"gate": "pq_scan_shuffle", "growth": round(growth, 2),
                "corpus_growth": round(hi["n_vectors"] / lo["n_vectors"], 1),
                "frac_of_codes_bytes": round(frac, 4),
                "ok": ok_const and ok_indep}
        violated = violated or not gate["ok"]
        print(json.dumps(gate), flush=True)
        print(f"\nscan shuffle {lo['scan_shuffle_kb']} KB -> "
              f"{hi['scan_shuffle_kb']} KB over "
              f"{gate['corpus_growth']}x corpus "
              f"({'OK' if gate['ok'] else 'VIOLATION'}: growth "
              f"{growth:.2f}x, {100 * frac:.2f}% of encoded corpus)")
        # r9 kernel-rewrite gate: the WHOLE train+encode pipeline
        # shuffles codebook-sized data only — constant over corpus
        # growth and a vanishing fraction of the raw vector bytes a
        # corpus-sized exchange (the falsified v1/v2 shapes) would
        # have moved.
        t_growth = hi["train_shuffle_kb"] / max(lo["train_shuffle_kb"], 1.0)
        vec_kb = hi["n_vectors"] * 64 * 8 / 1024   # dim 64 x 8B quantized
        t_frac = hi["train_shuffle_kb"] / vec_kb
        tgate = {"gate": "pq_train_shuffle", "growth": round(t_growth, 2),
                 "frac_of_vector_bytes": round(t_frac, 5),
                 "ok": t_growth <= 3.0 and t_frac <= 0.01}
        violated = violated or not tgate["ok"]
        print(json.dumps(tgate), flush=True)
        print(f"train+encode shuffle {lo['train_shuffle_kb']} KB -> "
              f"{hi['train_shuffle_kb']} KB over "
              f"{gate['corpus_growth']}x corpus "
              f"({'OK' if tgate['ok'] else 'VIOLATION'}: growth "
              f"{t_growth:.2f}x, {100 * t_frac:.3f}% of raw vectors)")
    return 1 if violated else 0


if __name__ == "__main__":
    sys.exit(main())
