#!/bin/bash
cd /root/repo
for k in gl32768 gl16384 gl8192; do
  echo "=== $k start $(date +%H:%M:%S)"
  timeout 3600 python scratch/save_proof.py "$k" 2>&1 | grep -vE "cpu_aot|WARNING"
  echo "=== $k rc=$? end $(date +%H:%M:%S)"
done
echo "BIG CHAIN DONE $(date +%H:%M:%S)"
