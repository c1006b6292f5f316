#!/bin/sh
# Round-2 TPU measurement queue — run detached as soon as the axon tunnel is
# back:   nohup sh tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Order: cheapest sanity first, then the stage profile + decision probes,
# then the D=8 cost model, then the headline bench, then the long soak.
set -x
cd /root/repo || exit 1

date
python -c "import jax; print(jax.devices())" || exit 1

echo "=== [1/5] headline bench ==="
timeout 1800 python bench.py
date

echo "=== [2/5] stage profile + micro probes ==="
timeout 2400 python tools/profile_step.py --micro
date

echo "=== [3/5] D=8 sharded cost model ==="
timeout 3600 python tools/profile_sharded.py

echo "=== [4/5] scale validation (quick) ==="
timeout 2400 python tools/validate_scale.py --frames 40 --iters 40

echo "=== [5/5] 200-frame soak ==="
timeout 7200 python tools/soak.py --frames 200 --out /tmp/soak_r2.json

date
echo TPU_QUEUE_DONE
