"""Run every example end-to-end at sf0.001 — the docs-stay-true gate.

Each example is a separate subprocess (own SparkSession, own temp
dirs); a nonzero exit from any fails the sweep.  ~30-60s each; run via
``bash tools/ci.sh`` or directly.

Usage: python tools/run_examples.py [pattern]
"""
import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pattern = sys.argv[1] if len(sys.argv) > 1 else "*"
examples = sorted(glob.glob(f"{HERE}/examples/{pattern}.py"))
if not examples:
    print(f"no examples match {pattern!r}")
    sys.exit(2)
failed = []
for ex in examples:
    name = os.path.basename(ex)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, ex], capture_output=True,
                       text=True, timeout=600)
    dt = time.perf_counter() - t0
    status = "OK" if r.returncode == 0 else f"FAIL({r.returncode})"
    print(f"{name}: {status} {dt:.1f}s")
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        failed.append(name)
print(f"\n{len(examples) - len(failed)}/{len(examples)} examples pass")
sys.exit(1 if failed else 0)
