#!/bin/bash
cd /root/repo
for k in gl1024 gl2048 gl4096 gl8192 bn1024 gl16384 gl32768; do
  echo "=== $k start $(date +%H:%M:%S)"
  timeout 3600 python scratch/save_proof.py "$k" 2>&1 | grep -vE "cpu_aot|WARNING"
  echo "=== $k rc=$? end $(date +%H:%M:%S)"
done
echo "CHAIN DONE $(date +%H:%M:%S)"
