#!/bin/bash
# Run quality checks one task per process (a tunnel hiccup then costs one
# task, not the whole sweep), with one retry per task.  Results append to
# the log as JSON lines.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
TASKS="${@:-instance_seg quadrilaterals text multilabel regression autoencoding}"
for t in $TASKS; do
  echo "=== $t ($(date +%H:%M:%S))"
  if ! timeout 1800 python tools/quality_checks.py "$t"; then
    echo "--- $t failed rc=$?; retrying once"
    sleep 60
    timeout 1800 python tools/quality_checks.py "$t" || echo "--- $t failed twice"
  fi
done
echo "quality sweep done"
