#!/usr/bin/env bash
# Dev-only: the full correctness gate at every local scale factor —
# `sbt runMain graft.Verify` then the DuckDB oracle compare, per SF.
# Catches scale-dependent luck (ROADMAP harness item). Extra SFs may
# be passed as arguments (e.g. ./scripts/verify_all.sh 0.1).
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in 0.001 0.01 "$@"; do
  out="/tmp/verify_out_sf${sf}"
  rm -rf "$out"
  echo "== sf${sf} =="
  sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out}" \
    2>&1 | tail -1
  python3 scripts/check.py "/root/testdata/sf${sf}" "$out" | tail -1
done
