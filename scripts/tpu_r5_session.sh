#!/bin/bash
# Round-5 one-session TPU measurement: kernel + class-API smoke, the full
# 33-row matrix (median-of-k protocol), then the driver metric — all on an
# idle host so rows are comparable (CLAUDE.md: concurrent load halves rates).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

echo "=== tpu_smoke ==="
timeout 2400 python -u scripts/tpu_smoke.py /tmp/r5_smoke.json

echo "=== matrix ==="
timeout 14400 python -u scripts/tpu_bench.py \
  auxiva_ip1 auxiva_ip1_bf16 auxiva_ip2 auxiva_iss1 auxiva_iss2 auxiva_ipa \
  ilrma_ip1 ilrma_ip2 ilrma_iss1 ilrma_iss2 ilrma_ipa \
  t_ilrma_ip1 ggd_ilrma_ip1 fdica_ip1 fdica_ip2 \
  grad_iva natural_grad_iva grad_fdica natural_grad_fdica \
  fast_iva faster_iva pds_iva admm_iva \
  mnmf mnmf_dense ipsdta cacgmm hva \
  ica_grad ica_natural_grad ica_fast wave_e2e bf16_loss \
  --out benchmarks/tpu_matrix_r5.json

echo "=== driver bench ==="
timeout 7200 python -u bench.py

echo "=== session done ==="
