#!/bin/bash
# Weak-regime alpha / head-capacity sweep for the multitask families
# (VERDICT r3 #1's "tune what the protocol allows" clause): does any
# supervision weight or capacity make sisua/misa clear the
# unsupervised-latent→ridge baseline below 50% labels?
#
# Protocol matches benchmarks/results_zoo_weak_p{02,10}.md exactly
# (citeseq simulator, weak_factors=8, 5 seeds, 40 epochs); only alpha /
# hidden vary. alpha=10 rows already exist in those files.
set -u
cd "$(dirname "$0")/.."
M=vae,sisua,misa
COMMON="--weak-factors 8 --seeds 5 --epochs 40 --models $M"

for a in 1 30 100; do
  python benchmarks/zoo_quality.py $COMMON --labels-percent 0.1 \
    --alpha "$a" --out "benchmarks/results_zoo_weak_p10_a${a}.md" \
    || echo "FAILED alpha=$a p10"
done
# head capacity at the protocol alpha
python benchmarks/zoo_quality.py $COMMON --labels-percent 0.1 \
  --hidden 128,128 --out benchmarks/results_zoo_weak_p10_h128.md \
  || echo "FAILED h128 p10"
# the 2% budget: strongest alpha + capacity, to bound the best case
python benchmarks/zoo_quality.py $COMMON --labels-percent 0.02 \
  --alpha 100 --out benchmarks/results_zoo_weak_p02_a100.md \
  || echo "FAILED alpha=100 p02"
echo SWEEP-DONE
