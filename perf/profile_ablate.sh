#!/bin/bash
cd /root/repo  # run from repo root
for a in "" nowalk nosweep; do
  echo "=== ABLATE='$a'"
  PHASE1_ABLATE=$a timeout 1200 python profile_phase1.py terrain2048 1920x1080 192 2>&1 | grep -E "phase1 Pallas|mismatches"
done
