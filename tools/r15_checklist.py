#!/usr/bin/env python3
"""Regenerate the OPTIMIZATION_r15.md per-query checklist table from the
committed sweep JSONs (baseline + the named after-sweeps): one row per
declared query, baseline seconds, min-across-after-sweeps seconds, and
the change tag for queries this round touched.

Usage: python3 tools/r15_checklist.py after1.json [after2.json ...]
Prints the markdown table to stdout.
"""
import json, sys

CHANGED = {
 'q_dedup_cluster': 'CC stars -> window-min',
 'q_dedup_cluster_incr': 'CC stars -> window-min (runs CC twice)',
 'q_dedup_corpus': 'CC stars + exact-tier persist',
 'q_source_overlap': 'shingles O(tokens^2) tokenizer fix',
 'q_knn_graph': 'inline directed pairs (no n^2 cache) + (bi,bj) repartition',
 'q_embed_neardup': '(bi,bj) repartition of the blocked join',
 'q_bpe_train': 'island window removed (one window spec/round)',
 'q_bpe_encode': 'island window removed (one window spec/round)',
 'q_kmeans': 'map-side array_min assignment (zero-shuffle)',
 'q_kmeans_quality': 'map-side array_min assignment',
 'q_semdedup_kmeans': 'map-side array_min assignment',
 'q_ann_ivf': 'map-side array_max assignment (zero-shuffle)',
 'q_ann_ivfpq': 'map-side array_max assignment',
 'q_ann_ivf_store': 'map-side array_max assignment',
}

def main(afters):
    base = json.load(open('plans/r15/bench_baseline.json'))['queries']
    runs = [json.load(open(p))['queries'] for p in afters]
    amin = {k: min(r[k] for r in runs) for k in base}
    print('| query | baseline s | after s (min of %d sweeps) | change this round |' % len(runs))
    print('| --- | --- | --- | --- |')
    for k in sorted(base):
        print(f'| {k} | {base[k]:.2f} | {amin[k]:.2f} | {CHANGED.get(k, "")} |')
    print()
    print(f'baseline total {sum(base.values()):.1f} s; after per-query-min total {sum(amin.values()):.1f} s')

if __name__ == '__main__':
    main(sys.argv[1:])
