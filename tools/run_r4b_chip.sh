#!/bin/bash
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$(date +%H:%M:%S)] $*"; }
log "1/3 packedcmp incl. fused stage"
python tools/bench_vocoder_stages.py packedcmp 2>&1 | tee /tmp/r4b_packedcmp.log
log "2/3 vocoder grid incl. packedf"
python tools/bench_vocoder_fast.py 2>&1 | tee /tmp/r4b_voc.log
log "3/3 e2e packed+fuse"
python tools/bench_e2e_serve.py packed fuse 2>&1 | tee /tmp/r4b_e2e.log
log "DONE"
