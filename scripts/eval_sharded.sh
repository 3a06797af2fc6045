#!/bin/bash
# Trial-sharded evaluation: split the trial budget across J parallel jobs
# by seed offset (the reference parallelises MS2 eval by sharding trials
# across SLURM jobs — INT-ACT/doc/evaluation.md:9-16). Each shard writes
# into its own out dir; merge with:
#   python -m cover_vla_tpu.eval.analyze OUT --compare shard1=OUT1 ...
set -euo pipefail
SUITE=${1:-simpler_widowx}
SHARDS=${2:-4}
TRIALS_PER_SHARD=${3:-25}
OUT=${OUT:-eval_out}

for i in $(seq 0 $((SHARDS - 1))); do
  python -m cover_vla_tpu.run --role eval \
    --eval.task_suite "$SUITE" \
    --eval.num_trials_per_task "$TRIALS_PER_SHARD" \
    --eval.seed $((7 + i * 1000)) \
    --eval.out_dir "$OUT/shard_$i" &
done
wait
python - <<PY
from cover_vla_tpu.eval.analyze import aggregate, load_episodes, render_table
import glob
eps = []
for d in sorted(glob.glob("$OUT/shard_*")):
    eps.extend(load_episodes(d))
print(render_table(aggregate(eps)))
PY
