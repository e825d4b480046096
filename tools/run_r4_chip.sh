#!/bin/bash
# Round-4 chip session: strictly sequential TPU jobs (the axon tunnel
# serializes clients; killing mid-compile wedges the device ~20-30 min, so
# this script is launched detached and never killed).
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "1/7 vocoder backends (module/mrf/packed grid)"
python tools/bench_vocoder_fast.py 2>&1 | tee /tmp/r4_voc.log

log "2/7 e2e serve, packed vocoder"
python tools/bench_e2e_serve.py packed 2>&1 | tee /tmp/r4_e2e_packed.log

log "3/7 train bf16 scan (structural-freeze refactor, unfrozen baseline)"
python tools/bench_train.py 24 bf16 2>&1 | tee /tmp/r4_train.log

log "4/7 train bf16 scan, frozen FS2 (DiffSinger production semantics)"
python tools/bench_train.py 24 bf16 freeze 2>&1 | tee /tmp/r4_train_freeze.log

log "5/7 train stage decomposition at production bf16 + dropout"
python tools/bench_train_stages.py bf16 dropout 2>&1 | tee /tmp/r4_stages.log

log "6/7 on-chip parity (incl. fused_e2e entries)"
python tools/verify_onchip.py 2>&1 | tee /tmp/r4_parity.log

log "7/7 headline bench.py"
python bench.py 2>&1 | tee /tmp/r4_bench.log

log "DONE"
